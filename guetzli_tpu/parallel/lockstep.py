"""Lockstep corpus quant-matrix search (phase 2 of the NOTES.md
lockstep batched-corpus design).

The reference encodes one image per process and its quant binary search
(SelectQuantMatrix, processor.cc:340-372) serializes a device round trip
per trial. Across a corpus those trials are independent, so each lockstep
round here dispatches EVERY active image's trial compare before fetching
any of them: the device programs and the pull round trips overlap across
the corpus, while each image's decision sequence stays bit-identical to
the serial search -- a decision depends only on that image's own
distances.

Each image keeps its own Processor/Comparator (per-image logs, stats and
MaybeOutput exactly as in the serial path); only the dispatch/fetch
ordering is interleaved.
"""

import sys

import numpy as np

from guetzli_tpu.runtime import is_worker_crash
from guetzli_tpu.search.processor import QuantMatrixGenerator

_TARGET_MUL_HIGH = 0.97
_TARGET_MUL_LOW = 0.95


class _QuantSearch:
    """One image's SelectQuantMatrix state machine (the non-speculative
    loop of Processor.select_quant_matrix, split at the fetch point)."""

    def __init__(self, proc, jpg_in, downsample, best_q, img):
        self.proc = proc
        self.jpg_in = jpg_in
        self.best_q = best_q
        self.img = img
        self.qgen = QuantMatrixGenerator(downsample)
        self.cur_q = best_q.copy()
        self.initial = True
        self.best = None
        self.done = False
        self.pending = None

    def dispatch(self):
        """Issue the current trial's device compare (async)."""
        self.pending = self.proc._quant_eval_start(self.jpg_in, self.cur_q)

    def resolve(self):
        """Fetch the trial, advance the binary search, set up the next
        trial's quant matrix (or finish)."""
        dist_ok, size = self.proc._quant_resolve(
            self.jpg_in, self.cur_q, *self.pending, self.img,
            _TARGET_MUL_HIGH)
        if self.initial:
            self.best = (self.cur_q.copy(), dist_ok, size)
            self.initial = False
        else:
            self.qgen.add(self.cur_q, dist_ok)
            better = ((dist_ok and not self.best[1])
                      or (dist_ok == self.best[1] and size < self.best[2]))
            if better:
                self.best = (self.cur_q.copy(), dist_ok, size)
                if dist_ok and not self.proc.comparator.distance_ok(
                        _TARGET_MUL_LOW):
                    self._finish()
                    return
        qn = self.qgen.get_next()
        if qn is None:
            self._finish()
            return
        self.cur_q = qn

    def _finish(self):
        self.best_q[:] = self.best[0]
        self.done = True


def lockstep_select_quant_matrix(procs, jpgs, downsamples, best_qs, imgs):
    """Run every image's quant-matrix search in lockstep rounds.

    Args are per-image lists; `best_qs` entries are mutated in place like
    Processor.select_quant_matrix's best_q. Returns the per-image dist_ok
    list (the serial method's return value).

    Padded-bucket comparators take the tree path: device-resident base
    coefficients, ~768 B uploaded per trial and ONE combined score pull
    per round across the corpus (search/quant_tree.py). The full-plane
    per-trial upload below is only the unpadded-mode fallback.
    """
    if all(p.comparator.geom is not None for p in procs):
        from guetzli_tpu.search.quant_tree import \
            lockstep_select_quant_matrix_tree
        return lockstep_select_quant_matrix_tree(
            procs, jpgs, downsamples, best_qs, imgs)
    sms = [_QuantSearch(p, j, d, q, i)
           for p, j, d, q, i in zip(procs, jpgs, downsamples, best_qs,
                                    imgs)]
    # Same-bucket trials coalesce into one vmapped program + one pull per
    # round (CompareBatcher); per-image decision sequences are unchanged.
    from guetzli_tpu.comparator import CompareBatcher
    batcher = CompareBatcher()
    shared = []
    for p in procs:
        if p.comparator.geom is not None and p.comparator.batcher is None:
            p.comparator.batcher = batcher
            shared.append(p.comparator)
    try:
        return _lockstep_rounds(sms)
    finally:
        for c in shared:
            c.batcher = None


def _lockstep_rounds(sms):
    while True:
        active = [s for s in sms if not s.done]
        if not active:
            break
        for s in active:          # dispatch-all: device work overlaps
            s.dispatch()
        for s in active:          # fetch-all, in corpus order
            s.resolve()
    return [s.best[1] for s in sms]


def encode_corpus_lockstep(inputs, quality: float = 95,
                           force_420: bool = False,
                           try_420: bool = False,
                           use_silver_screen: bool = False,
                           threads: int = 1,
                           phase_walls=None):
    """Encode a corpus of PNG/JPEG images with the search phases in
    lockstep.

    Each pass of the reference driver (444, and the 420 pass under
    force_420/try_420 or a 420 JPEG input -- processor.cc:986-1016) runs
    phase-synchronized across the corpus: quant matrices via
    lockstep_select_quant_matrix (one dispatch wave per binary-search
    round), then ONE staged zeroing run per masking pass over every
    image's blocks concatenated (per-block error limits), then the
    per-image back-end loop. Outputs are byte-identical to serial
    `encode_bytes` per image (tests/test_lockstep.py).

    Inputs needing other paths (<32px, unsupported JPEGs) fall back to
    the serial encoder. Returns [(name, jpeg_bytes)].
    """
    from guetzli_tpu import consts
    from guetzli_tpu.codec import reader
    from guetzli_tpu.codec.encoder import encode_rgb_to_jpeg
    from guetzli_tpu.comparator import Comparator
    from guetzli_tpu.io.png import read_png
    from guetzli_tpu.runtime import configure
    from guetzli_tpu.search import state as st
    from guetzli_tpu.search.processor import (Params, Processor,
                                              ProcessStats, _copy_jpeg,
                                              _is_grayscale,
                                              decode_jpeg_to_rgb)
    configure()
    target = consts.butteraugli_score_for_quality(quality)

    ctxs, results = [], {}
    for name, data in inputs:
        params = Params(force_420=force_420, try_420=try_420,
                        use_silver_screen=use_silver_screen)
        params.butteraugli_target = target
        input_is_420 = False
        if data[:2] == b"\xff\xd8":
            # JPEG input (processor.cc:1029-1066): parse, decode to RGB;
            # a 420 input forces the 420 pass for that image.
            try:
                jpg_in = reader.read_jpeg(data)
            except reader.JpegError:
                jpg_in = None
            rgb = None
            if jpg_in is not None and reader.check_jpeg_sanity(jpg_in) \
                    and len(jpg_in.components) == 3 \
                    and (jpg_in.is_444() or jpg_in.is_420()):
                rgb = decode_jpeg_to_rgb(jpg_in)
            if rgb is None:
                from guetzli_tpu.parallel.api import encode_bytes
                results[name] = encode_bytes(data, quality, params=params)
                continue
            input_is_420 = jpg_in.is_420()
            w, h = jpg_in.width, jpg_in.height
        else:
            rgb, w, h = read_png(data)
            jpg_in = None
        if w < 32 or h < 32:
            from guetzli_tpu.search.processor import process_rgb
            results[name] = process_rgb(params, rgb, w, h, ProcessStats())
            continue
        comp = Comparator(rgb, w, h, target)
        proc = Processor(params, comp, ProcessStats())
        if jpg_in is None:
            jpg_in = encode_rgb_to_jpeg(rgb, w, h)
        # process_jpeg_data pre-search steps (processor.cc:950-984).
        encoded = proc.output_jpeg(jpg_in)
        proc.final.score = -1
        proc.stats.log("Original Out[%7d]", len(encoded))
        jpg0 = _copy_jpeg(jpg_in)
        q_in = st.remove_original_quantization(jpg0)
        proc._compare(st.CoeffImage.from_jpeg(jpg0))
        proc.maybe_output(encoded)
        ds_lo_i = 1 if (input_is_420 or force_420) else 0
        ds_hi_i = 1 if (input_is_420 or force_420
                        or (try_420 and not _is_grayscale(jpg_in))) else 0
        ctxs.append({"name": name, "proc": proc, "jpg_in": jpg_in,
                     "q_in": q_in, "ds_lo": ds_lo_i, "ds_hi": ds_hi_i})

    if not ctxs:
        return [(n, results[n]) for n, _ in inputs if n in results]

    # Corpus-wide batcher: the quant rounds AND the threaded back-end
    # phase coalesce same-bucket compares into one program per wave.
    from guetzli_tpu.comparator import CompareBatcher
    corpus_batcher = CompareBatcher()
    for c in ctxs:
        if c["proc"].comparator.geom is not None:
            c["proc"].comparator.batcher = corpus_batcher

    ds_lo_all = min(c["ds_lo"] for c in ctxs)
    ds_hi_all = max(c["ds_hi"] for c in ctxs)
    for downsample in range(ds_lo_all, ds_hi_all + 1):
        batch = [c for c in ctxs
                 if c["ds_lo"] <= downsample <= c["ds_hi"]]
        if not batch:
            continue
        procs, jpgs, imgs, best_qs = [], [], [], []
        for c in batch:
            jpg = _copy_jpeg(c["jpg_in"])
            st.remove_original_quantization(jpg)
            img = st.CoeffImage.from_jpeg(jpg)
            if downsample:
                if img.comps[1].factor_x == 1 and \
                        img.comps[1].factor_y == 1:
                    img.downsample(use_silver_screen=use_silver_screen)
                jpg = img.save_to_jpeg_data(jpg)
            procs.append(c["proc"])
            jpgs.append(jpg)
            imgs.append(img)
            best_qs.append(c["q_in"].copy())

        import time as _time
        t0 = _time.time()
        oks = lockstep_select_quant_matrix(
            procs, jpgs, [downsample != 0] * len(batch), best_qs, imgs)
        if phase_walls is not None:
            phase_walls["quant"] = phase_walls.get("quant", 0.0) \
                + (_time.time() - t0)
        for i, ok in enumerate(oks):
            if not ok:
                best_qs[i][:] = 1
            imgs[i].comps = st.CoeffImage.from_jpeg(jpgs[i]).comps
            imgs[i].apply_global_quantization(best_qs[i])

        trip = list(zip(procs, jpgs, imgs))
        if not downsample:
            _corpus_masking(trip, 7, [1.0] * len(batch), False, threads,
                            phase_walls)
        else:
            ymuls = [1.0 if len(j.components) == 1 else 0.97 for j in jpgs]
            _corpus_masking(trip, 1, ymuls, False, threads, phase_walls)
            _corpus_masking(trip, 6, [1.0] * len(batch), True, threads,
                            phase_walls)

    for c in ctxs:
        results[c["name"]] = c["proc"].final.jpeg_data
    return [(n, results[n]) for n, _ in inputs]


def _corpus_masking(trip, comp_mask, target_muls, stop_early, threads=1,
                    phase_walls=None):
    """One masking pass, lockstep across the corpus: per-image inputs and
    frozen aux state, ONE combined staged zeroing run (per-block limits),
    then the back-end loops in lockstep iteration rounds (one combined
    result pull per round). Per-block math is independent, so results are
    bit-identical to per-image runs."""
    import time as _time

    import jax.numpy as jnp

    from guetzli_tpu.search import zeroing

    _t_zero = _time.time()

    def _prep(args):
        proc, jpg, img = args
        last_c = comp_mask.bit_length() - 1
        grid = img.comps[last_c]
        blocks, orig = proc.masking_inputs(jpg, img, comp_mask)
        mode, aux = proc.masking_aux(img, comp_mask, grid)
        # Padded-bucket mode: masking_aux returns bucket-grid aux arrays,
        # so the block axis must be padded to the same grid (exactly as
        # Processor.select_frequency_masking does) before concatenation.
        geom = getattr(proc.comparator, "geom", None)
        if geom is not None:
            nb = grid.bw * grid.bh
            factor = grid.factor_x
            gbwp = geom.wp // (8 * factor)
            gbhp = geom.hp // (8 * factor)
            blocks = geom.pad_blocks(
                blocks.reshape(nb, -1), grid.bw, grid.bh, gbwp,
                gbhp).reshape(-1, 3, 64)
            orig = geom.pad_blocks(
                orig.reshape(nb, -1), grid.bw, grid.bh, gbwp,
                gbhp).reshape(-1, 3, 64)
            unpad = (geom, grid.bw, grid.bh, gbwp, gbhp, nb)
        else:
            unpad = None
        return (blocks, orig, mode, aux,
                np.float32(proc.comparator.block_error_limit()),
                unpad)

    # Per-image aux building (frozen opsin tiles, mask scales, device
    # uploads) is independent across images: run it on the thread pool.
    if threads > 1 and len(trip) > 1:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(
                max_workers=min(threads, len(trip))) as pool:
            per = list(pool.map(_prep, trip))
    else:
        per = [_prep(t) for t in trip]
    # Images can evaluate under different modes in one pass (e.g. a
    # grayscale image keeps 444 geometry through the 420 pass because its
    # all-zero chroma skips downsampling): bucket by mode and run one
    # combined zeroing program per bucket.
    modes = sorted({p[2] for p in per})
    if len(modes) > 1:
        for m in modes:
            idx = [i for i, p in enumerate(per) if p[2] == m]
            _corpus_masking([trip[i] for i in idx], comp_mask,
                            [target_muls[i] for i in idx], stop_early,
                            threads, phase_walls)
        return
    mode = modes[0]
    cat_blocks = np.concatenate([p[0] for p in per])
    cat_orig = np.concatenate([p[1] for p in per])
    cat_aux = tuple(
        jnp.concatenate([jnp.asarray(p[3][k]) for p in per])
        for k in range(len(per[0][3])))
    limits = np.concatenate([
        np.full(len(p[0]), p[4], np.float32) for p in per])
    # Combined real-block index over the concatenated (padded) block
    # axis: per image, the bucket-grid rows of its real blocks, shifted
    # by its segment offset. The device-side CSR compaction then pulls
    # only selected candidates of real blocks (parallel batch of the
    # single-image path in Processor.select_frequency_masking).
    real_parts, real_counts = [], []
    off = 0
    for p in per:
        nbp = len(p[0])
        if p[5] is not None:
            _geom, bw, bh, gbwp, _gbhp, nb_real = p[5]
            r = np.arange(nb_real, dtype=np.int64)
            real_parts.append(off + (r // bw) * gbwp + r % bw)
            real_counts.append(nb_real)
        else:
            real_parts.append(off + np.arange(nbp, dtype=np.int64))
            real_counts.append(nbp)
        off += nbp
    real_index = np.concatenate(real_parts)
    p0 = trip[0][0].params
    for attempt in range(3):
        try:
            cat_off, cat_idx, cat_err = zeroing.compute_zeroing_csr_staged(
                cat_blocks, cat_orig, limits, cat_aux, mode, comp_mask,
                real_index=real_index,
                lookahead=p0.zeroing_greedy_lookahead,
                new_model=p0.new_zeroing_model,
                early_exit=p0.zeroing_early_exit)
            break
        except Exception as e:
            if not is_worker_crash(e) or attempt == 2:
                raise
            sys.stderr.write("worker crash during corpus zeroing; "
                             "recovering\n")
            for proc, _, _ in trip:
                proc.comparator.recover_device_state()

    if phase_walls is not None:
        phase_walls["zeroing"] = phase_walls.get("zeroing", 0.0) \
            + (_time.time() - _t_zero)
    _t_back = _time.time()

    def start(item):
        """Per-image back-end prep; returns the iteration generator."""
        (proc, jpg, img), _p, mul, row0, nbr = item
        offsets = cat_off[row0:row0 + nbr + 1] - cat_off[row0]
        lo, hi = cat_off[row0], cat_off[row0 + nbr]
        cand_idx = cat_idx[lo:hi]
        cand_err = cat_err[lo:hi]
        proc.comparator.finish_block_comparisons()
        return proc.back_end_steps(jpg, img, comp_mask, mul, stop_early,
                                   offsets, cand_idx, cand_err)

    items = []
    row0 = 0
    for t, p, mul, nbr in zip(trip, per, target_muls, real_counts):
        items.append((t, p, mul, row0, nbr))
        row0 += nbr

    # Lockstep iteration rounds: advance every image's generator to its
    # fetch point (its compare is dispatched, its host serialization
    # done), then pull ALL pending (score, weights) in ONE combined
    # device_get. Each image's decision sequence depends only on its own
    # results, so outputs stay byte-identical to serial; the per-image
    # tunnel round trip per iteration collapses to one per round.
    #
    # threads > 1 additionally runs the per-image HOST work of a round
    # (order build, flips, incremental serialization -- numpy + native
    # code that releases the GIL) on a pool: within a round the images
    # are independent, so thread scheduling cannot change any decision.
    from guetzli_tpu import comparator as cmp_mod

    def _advance(gen, res):
        try:
            return gen.send(res) if res is not None else next(gen)
        except StopIteration:
            return None

    pool = None
    if threads > 1 and len(items) > 1:
        from concurrent.futures import ThreadPoolExecutor
        pool = ThreadPoolExecutor(max_workers=min(threads, len(items)))
    try:
        active = []
        gens = [(item[0][0], start(item)) for item in items]
        firsts = (list(pool.map(lambda pg: _advance(pg[1], None), gens))
                  if pool else [_advance(g, None) for _, g in gens])
        for (proc, gen), first in zip(gens, firsts):
            if first is not None:
                active.append((proc, gen, first[0], first[1]))
        while active:
            comps = [a[0].comparator for a in active]
            handles = [a[2] for a in active]
            try:
                results = cmp_mod.fetch_compare_many(comps, handles)
            except Exception as e:
                if not is_worker_crash(e):
                    raise
                sys.stderr.write("worker crash during corpus back-end; "
                                 "recovering per image\n")
                results = [a[0]._recoverable(
                    a[3], a[0].comparator.fetch_compare, a[2])
                    for a in active]
            if pool:
                steps = list(pool.map(
                    lambda ar: _advance(ar[0][1], ar[1]),
                    zip(active, results)))
            else:
                steps = [_advance(gen, res)
                         for (_p, gen, _h, _r), res in zip(active, results)]
            active = [(proc, gen, step[0], step[1])
                      for (proc, gen, _h, _r), step in zip(active, steps)
                      if step is not None]
    finally:
        if pool:
            pool.shutdown(wait=True)
    if phase_walls is not None:
        phase_walls["backend"] = phase_walls.get("backend", 0.0) \
            + (_time.time() - _t_back)
