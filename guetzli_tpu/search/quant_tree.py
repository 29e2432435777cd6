"""One-fetch quant-matrix selection: speculative evaluation of the whole
binary-search tree.

SelectQuantMatrix (processor.cc:340-372) is a data-dependent loop: the
next candidate matrix depends only on the (matrix, distance_ok) history
through QuantMatrixGenerator arithmetic -- never on the raw distances.
The candidate tree is therefore enumerable on the host before any device
work: from the current generator state, cloning the generator down both
outcome branches yields every matrix the search could visit in the next
`depth` iterations.

This driver evaluates those candidates in waves: all not-yet-scored
matrices of the upcoming subtree go to the device as ONE batched program
(requantization happens on-device from the resident base coefficients --
~768 bytes uploaded per trial instead of the full coefficient planes) and
ONE score pull. The serial loop is then replayed exactly -- same trial
order, same logging, same MaybeOutput sequence, same generator updates --
with distances read from the memo. A depth-3 wave covers 4 serial
iterations per round trip; typical searches finish in 2-4 fetches instead
of 10-20.

Results are identical to the serial loop by construction: the replay IS
the serial loop, only the compare transport differs.
"""

import numpy as np

from guetzli_tpu.search import state as st


def _enumerate_subtree(qgen, cur_q, initial, depth):
    """Every matrix the serial loop could visit within `depth` iterations
    starting from (generator state, current trial). Depth-first over the
    outcome branches; generators are cloned, the caller's is untouched."""
    out = []
    seen = set()
    stack = [(qgen, cur_q, initial, 0)]
    while stack:
        g, q, init, d = stack.pop()
        key = q.tobytes()
        if key not in seen:
            seen.add(key)
            out.append(q)
        if d >= depth:
            continue
        # The initial trial is never Add()ed (processor.cc:344-352), so
        # both outcome branches share one successor.
        for outcome in ((True,) if init else (True, False)):
            g2 = g.clone()
            if not init:
                g2.add(q, outcome)
            qn = g2.get_next()
            if qn is not None:
                stack.append((g2, qn, False, d + 1))
    return out


def select_quant_matrix_tree(proc, jpg_in, downsample, best_q, img,
                             depth=3):
    """Drop-in replacement for Processor.select_quant_matrix using wave
    evaluation. Requires comparator.supports_quant_batch()."""
    from guetzli_tpu.search.processor import (QuantMatrixGenerator,
                                              quant_matrix_heuristic_score)
    comp = proc.comparator
    base_img = st.CoeffImage.from_jpeg(jpg_in)
    base = comp.quant_base_upload(base_img)

    memo = {}                       # q bytes -> (score, handle, row)

    def ensure(qs):
        fresh, seen = [], set()
        for q in qs:
            k = q.tobytes()
            if k not in memo and k not in seen:
                seen.add(k)
                fresh.append(q)
        wave = comp.quant_batch_sizes()[-1]
        for i in range(0, len(fresh), wave):
            chunk = fresh[i:i + wave]
            with proc.stats.timed("quant_device"):
                handle = comp.dispatch_quant_batch(base, chunk)
                scores = comp.fetch_quant_scores(handle)
            for j, q in enumerate(chunk):
                memo[q.tobytes()] = (scores[j], handle, j)

    qgen = QuantMatrixGenerator(downsample)
    target_mul_high = 0.97
    target_mul_low = 0.95
    cur_q = best_q.copy()
    initial = True
    best = None
    while True:
        key = cur_q.tobytes()
        if key not in memo:
            ensure(_enumerate_subtree(qgen, cur_q, initial, depth))
        score, handle, row = memo[key]

        # Replay one serial iteration (TryQuantMatrix, :310-338): host
        # requantization (bit-identical to the device's), serialization,
        # reference-format logging, MaybeOutput -- in the serial order.
        with proc.stats.timed("quant_host"):
            trial = base_img.copy()
            trial.apply_global_quantization(cur_q)
            img.comps = trial.comps
            encoded = proc.output_jpeg(trial.save_to_jpeg_data(jpg_in))
        proc.stats.inc("iters")
        from guetzli_tpu.search.processor import _frame_type_str
        proc.stats.log("Iter %2d: %s quantization matrix:\n",
                       proc.stats.counters["iters"], _frame_type_str(img))
        proc.stats.log_quant(cur_q)
        proc.stats.log("Iter %2d: %s GQ[%5.2f] Out[%7d]",
                       proc.stats.counters["iters"], _frame_type_str(img),
                       quant_matrix_heuristic_score(cur_q), len(encoded))
        comp.set_quant_result(handle, row, score)
        proc.stats.log(" BA[100.00%%] D[%6.4f]", comp.distance)
        dist_ok = comp.distance_ok(target_mul_high)
        proc.maybe_output(encoded)
        size = len(encoded)

        if initial:
            best = (cur_q.copy(), dist_ok, size)
            initial = False
        else:
            qgen.add(cur_q, dist_ok)
            better = ((dist_ok and not best[1])
                      or (dist_ok == best[1] and size < best[2]))
            if better:
                best = (cur_q.copy(), dist_ok, size)
                if dist_ok and not comp.distance_ok(target_mul_low):
                    break
        qn = qgen.get_next()
        if qn is None:
            break
        cur_q = qn
    best_q[:] = best[0]
    return best[1]
