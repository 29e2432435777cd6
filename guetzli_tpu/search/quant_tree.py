"""One-fetch quant-matrix selection: speculative evaluation of the whole
binary-search tree.

SelectQuantMatrix (processor.cc:340-372) is a data-dependent loop: the
next candidate matrix depends only on the (matrix, distance_ok) history
through QuantMatrixGenerator arithmetic -- never on the raw distances.
The candidate tree is therefore enumerable on the host before any device
work: from the current generator state, cloning the generator down both
outcome branches yields every matrix the search could visit in the next
`depth` iterations.

TreeQuantSearch evaluates those candidates in waves: all not-yet-scored
matrices of the upcoming subtree go to the device as ONE batched program
(requantization happens on-device from the resident base coefficients --
~768 bytes uploaded per trial instead of the full coefficient planes) and
ONE score pull. The serial loop is then replayed exactly -- same trial
order, same logging, same MaybeOutput sequence, same generator updates --
with distances read from the memo. A depth-3 wave covers 4 serial
iterations per round trip; typical searches finish in 2-4 fetches instead
of 10-20.

Two drivers share the state machine:
  - select_quant_matrix_tree: one image, dispatch+fetch per wave.
  - lockstep_select_quant_matrix_tree: a corpus; every active image's
    waves are dispatched first, then ALL score arrays are pulled in one
    combined device_get per round (parallel/lockstep.py uses this).

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


class TreeQuantSearch:
    """One image's SelectQuantMatrix as a resumable state machine:
    dispatch_waves() issues the device programs for the upcoming subtree,
    absorb() memoizes fetched scores, replay() advances the serial loop
    until it needs an unscored matrix (or finishes, setting best_q)."""

    def __init__(self, proc, jpg_in, downsample, best_q, img, depth=3):
        from guetzli_tpu.search.processor import QuantMatrixGenerator
        self.proc = proc
        self.jpg_in = jpg_in
        self.img = img
        self.depth = depth
        self.best_q_out = best_q
        comp = proc.comparator
        self.base_img = st.CoeffImage.from_jpeg(jpg_in)
        self.base = comp.quant_base_upload(self.base_img)
        self.memo = {}              # q bytes -> (score, handle, row)
        self.qgen = QuantMatrixGenerator(downsample)
        self.cur_q = best_q.copy()
        self.initial = True
        self.best = None
        self.done = False

    def dispatch_waves(self):
        """Dispatch one batched program per wave of unscored subtree
        matrices; returns [(handle, chunk)] for absorb()."""
        comp = self.proc.comparator
        fresh, seen = [], set()
        for q in _enumerate_subtree(self.qgen, self.cur_q, self.initial,
                                    self.depth):
            k = q.tobytes()
            if k not in self.memo and k not in seen:
                seen.add(k)
                fresh.append(q)
        wave = comp.quant_batch_sizes()[-1]
        pending = []
        for i in range(0, len(fresh), wave):
            chunk = fresh[i:i + wave]
            with self.proc.stats.timed("quant_device"):
                pending.append((comp.dispatch_quant_batch(self.base, chunk),
                                chunk))
        return pending

    def absorb(self, pending, scores_per_wave):
        """Memoize fetched scores; scores_per_wave[i] aligns with
        pending[i]'s chunk."""
        for (handle, chunk), scores in zip(pending, scores_per_wave):
            for j, q in enumerate(chunk):
                self.memo[q.tobytes()] = (float(scores[j]), handle, j)

    def replay(self):
        """Replay serial iterations (TryQuantMatrix, :310-338) from the
        memo: host requantization (bit-identical to the device's),
        serialization, reference-format logging, MaybeOutput -- in the
        serial order. Stops at a memo miss (returns False; dispatch more)
        or at search end (returns True; best_q_out is set)."""
        from guetzli_tpu.search.processor import (
            _frame_type_str, quant_matrix_heuristic_score)
        proc, comp = self.proc, self.proc.comparator
        target_mul_high = 0.97
        target_mul_low = 0.95
        while True:
            key = self.cur_q.tobytes()
            if key not in self.memo:
                return False
            score, handle, row = self.memo[key]

            with proc.stats.timed("quant_host"):
                trial = self.base_img.copy()
                trial.apply_global_quantization(self.cur_q)
                self.img.comps = trial.comps
                encoded = proc.output_jpeg(
                    trial.save_to_jpeg_data(self.jpg_in))
            proc.stats.inc("iters")
            proc.stats.log("Iter %2d: %s quantization matrix:\n",
                           proc.stats.counters["iters"],
                           _frame_type_str(self.img))
            proc.stats.log_quant(self.cur_q)
            proc.stats.log("Iter %2d: %s GQ[%5.2f] Out[%7d]",
                           proc.stats.counters["iters"],
                           _frame_type_str(self.img),
                           quant_matrix_heuristic_score(self.cur_q),
                           len(encoded))
            comp.set_quant_result(handle, row, score)
            proc.stats.log(" BA[100.00%%] D[%6.4f]", comp.distance)
            dist_ok = comp.distance_ok(target_mul_high)
            proc.maybe_output(encoded)
            size = len(encoded)

            if self.initial:
                self.best = (self.cur_q.copy(), dist_ok, size)
                self.initial = False
            else:
                self.qgen.add(self.cur_q, dist_ok)
                better = ((dist_ok and not self.best[1])
                          or (dist_ok == self.best[1]
                              and size < self.best[2]))
                if better:
                    self.best = (self.cur_q.copy(), dist_ok, size)
                    if dist_ok and not comp.distance_ok(target_mul_low):
                        break
            qn = self.qgen.get_next()
            if qn is None:
                break
            self.cur_q = qn
        self.best_q_out[:] = self.best[0]
        # Drop the memoized wave handles (score arrays). Note the
        # comparator's distmap is NOT updated by the quant phase at all
        # (see set_quant_result): nothing may read it before the first
        # back-end compare overwrites it.
        self.memo.clear()
        # The device-resident base coefficient planes (and the host base
        # image copy) are only needed while trials are being issued.
        self.base = None
        self.base_img = None
        self.done = True
        return True


def select_quant_matrix_tree(proc, jpg_in, downsample, best_q, img,
                             depth=3):
    """Drop-in replacement for Processor.select_quant_matrix using wave
    evaluation. Requires comparator.supports_quant_batch()."""
    sm = TreeQuantSearch(proc, jpg_in, downsample, best_q, img, depth)
    comp = proc.comparator
    while not sm.done:
        pending = sm.dispatch_waves()
        with proc.stats.timed("quant_device"):
            scores = [comp.fetch_quant_scores(h) for h, _ in pending]
        sm.absorb(pending, scores)
        sm.replay()
    return sm.best[1]


def lockstep_select_quant_matrix_tree(procs, jpgs, downsamples, best_qs,
                                      imgs, depth=3):
    """Corpus quant search in lockstep rounds: per round, every active
    image dispatches its subtree waves (768 B of quant matrices each --
    the base coefficients are device-resident), then ALL score arrays are
    pulled in one combined device_get, then each image replays its serial
    iterations. Per-image decision sequences, logs and MaybeOutput order
    are identical to the serial tree search (which is identical to the
    serial loop). Returns the per-image dist_ok list."""
    import jax

    sms = [TreeQuantSearch(p, j, d, q, i, depth)
           for p, j, d, q, i in zip(procs, jpgs, downsamples, best_qs,
                                    imgs)]
    while True:
        active = [s for s in sms if not s.done]
        if not active:
            break
        pend = [(s, s.dispatch_waves()) for s in active]
        # One combined pull for every wave of every image this round.
        flat = [h for _s, p in pend for h, _c in p]
        pulled = jax.device_get([h[0] for h in flat])
        scores_by_handle = {}
        for (handle, pulled_scores) in zip(flat, pulled):
            b = handle[2]
            scores_by_handle[id(handle)] = (
                np.asarray(pulled_scores)[:b].astype(np.float64))
        for s, p in pend:
            s.absorb(p, [scores_by_handle[id(h)] for h, _c in p])
            s.replay()
    return [s.best[1] for s in sms]
