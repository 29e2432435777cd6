"""The Guetzli search driver: quant-matrix search + frequency masking.

TPU redesign of guetzli/processor.cc. The orchestration (binary search over
quant matrices, the up/down coefficient adjustment loop, output selection)
stays on host exactly as the reference keeps it on CPU; every metric
evaluation inside it is a single jitted device call:

  * TryQuantMatrix (processor.cc:310-338)  -> one batched requantize +
    full-diffmap compare per candidate matrix;
  * ComputeBlockZeroingOrder loop (:376-487, :643-671) -> one batched
    greedy zeroing kernel over all blocks (search/zeroing.py);
  * the back-end up/down loop (:723-919) -> host loop with device
    distmap/weights, incremental histogram entropy estimation on host.
"""

import os
import sys
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from guetzli_tpu import consts
from guetzli_tpu.codec import histograms as hg
from guetzli_tpu.codec import jpeg_data as jd
from guetzli_tpu.codec import writer as jwriter
from guetzli_tpu.codec.encoder import encode_rgb_to_jpeg
from guetzli_tpu.comparator import Comparator
from guetzli_tpu.search import state as st
from guetzli_tpu.runtime import is_worker_crash
from guetzli_tpu.search import zeroing

K_BLOCK = 192


@dataclass
class Params:
    """processor.h:34-42."""
    butteraugli_target: float = 1.0
    clear_metadata: bool = True
    try_420: bool = False
    force_420: bool = False
    use_silver_screen: bool = False
    zeroing_greedy_lookahead: int = 3
    new_zeroing_model: bool = True
    # The reference's --c fast path stops each block's greedy zeroing once
    # its error reaches the block error limit (processor.cc:458-465);
    # output differs slightly from the exhaustive default, same validity.
    zeroing_early_exit: bool = False


@dataclass
class GuetzliOutput:
    jpeg_data: bytes = b""
    score: float = -1.0


@dataclass
class ProcessStats:
    counters: dict = field(default_factory=dict)
    timings: dict = field(default_factory=dict)
    debug: bool = False
    # Set when the search threw and the fallback output was emitted
    # instead (processor.cc:965-977 resilience model); benchmarks must
    # report this as a failure, not a timing.
    search_error: str = None

    def inc(self, name, amount=1):
        self.counters[name] = self.counters.get(name, 0) + amount

    def timed(self, name):
        """Context manager accumulating wall time under timings[name]
        (the jax.profiler/per-stage-timing analog of the reference's
        gperftools + CL_QUEUE_PROFILING hooks, SURVEY.md §5)."""
        import contextlib
        import time as _t

        @contextlib.contextmanager
        def cm():
            t0 = _t.time()
            try:
                yield
            finally:
                self.timings[name] = (self.timings.get(name, 0.0)
                                      + _t.time() - t0)
        return cm()

    def log(self, fmt, *args):
        if self.debug:
            sys.stderr.write(fmt % args if args else fmt)

    def log_quant(self, q):
        """GUETZLI_LOG_QUANT (debug_print.h:37-47): 8 rows of the three
        channels' quant matrix rows side by side."""
        if not self.debug:
            return
        q = np.asarray(q).reshape(3, 64)
        for y in range(8):
            row = "   ".join(
                " ".join("%2d" % q[c, y * 8 + x] for x in range(8))
                for c in range(3))
            sys.stderr.write("  " + row + "\n")


def _backend_pipeline_lag(comparator):
    """Pipeline depth for the back-end up/down loop.

    Lag N >= 1 builds iteration k's candidate order from the weights of
    compare k-N (prefetched in the background) instead of synchronizing
    on compare k-1. At lag 1 the win is collapsing each iteration's two
    round trips (dispatch-wait + result pull, ~2 RTT serial) into one:
    the transfer streams via copy_to_host_async while the dispatch
    returns, and only the serialize window overlaps host work (bees
    fetch 1.34 s -> 0.70 s measured). Lag >= 2 additionally overlaps
    whole iterations (fetch 0.34 s) but the staler weights inflate the
    down phase (~+9 iterations per lag step, banked in
    tpu_r04_pipeline_ab.json) -- hence not the default. Every
    iteration's serialized output is still scored with its own fetched
    distance before MaybeOutput, so output *selection* keeps the
    reference semantics (processor.cc:723-919). Default: lag 1 on
    accelerators, 0 (exact, fully synchronous) on the CPU backend.
    GUETZLI_TPU_PIPELINE overrides.
    """
    import jax

    from guetzli_tpu import config
    lag = config.current().pipeline_lag
    if lag is not None:
        return max(0, lag)
    if jax.default_backend() == "cpu":
        return 0
    return 1


def compare_quant_matrices(a, b):
    """processor.cc:168-190 lexicographic dominance compare on [192]."""
    a = a.reshape(-1)
    b = b.reshape(-1)
    if np.array_equal(a, b):
        return 0
    if np.all(a <= b):
        return -1
    if np.all(a >= b):
        return 1
    return 2


def quant_matrix_heuristic_score(q):
    """processor.cc:196-204.

    Accumulated in the reference's exact operation order (c-major,
    k-minor sequential double adds): the generator's ladder lands on
    exact multiples of total_csf, where a last-ulp difference from
    pairwise (np.sum) summation flips `score > 0.0` decisions inside
    _q_for_score and yields a different matrix -- the source of the
    q84 stripes/noise golden divergences."""
    cs = 1.0 / (1.0 + consts.JPEG_ZIGZAG_ORDER.astype(np.float64) / 2.0)
    terms = 0.5 * (np.asarray(q, np.float64).reshape(3, 64) - 1.0) * cs
    score = 0.0
    for c in range(3):
        for k in range(64):
            score += terms[c, k]
    return score


class QuantMatrixGenerator:
    """Binary search over the heuristic CSF score (processor.cc:206-308)."""

    def __init__(self, downsample):
        self.downsample = downsample
        self.hscore_a = -1.0
        self.hscore_b = -1.0
        self.total_csf = consts.TOTAL_CSF
        self.quants = []          # list of (q, dist_ok)

    def _q_for_score(self, score):
        """processor.cc:284-294."""
        q = np.zeros((3, 64), dtype=np.int32)
        level = int(score / self.total_csf)
        score -= level * self.total_csf
        nat = consts.JPEG_NATURAL_ORDER
        cs = 1.0 / (1.0 + consts.JPEG_ZIGZAG_ORDER.astype(np.float64) / 2.0)
        for k in range(63, -1, -1):
            q[:, nat[k]] = 2 * level + (3 if score > 0.0 else 1)
            score -= 3.0 * cs[nat[k]]
        return q

    def get_next(self):
        for _ in range(1000):
            if self.hscore_b == -1.0:
                if self.hscore_a == -1.0:
                    hscore = 0.0 if self.downsample else self.total_csf
                else:
                    if self.hscore_a < 5.0 * self.total_csf:
                        hscore = self.hscore_a + self.total_csf
                    else:
                        hscore = 2 * (self.hscore_a + self.total_csf)
                if hscore > 100 * self.total_csf:
                    return None
            elif self.hscore_b == 0.0:
                return None
            elif self.hscore_a == -1.0:
                hscore = 0.0
            else:
                eps = 0.05
                mid = 0.5 * (self.hscore_a + self.hscore_b)
                lower = self._q_for_score((1 - eps) * self.hscore_a
                                          + eps * mid)
                upper = self._q_for_score((1 - eps) * self.hscore_b
                                          + eps * mid)
                if compare_quant_matrices(lower, upper) == 0:
                    return None
                hscore = mid
            q = self._q_for_score(hscore)
            retry = False
            for prev_q, dist_ok in self.quants:
                if compare_quant_matrices(q, prev_q) == 0:
                    if dist_ok:
                        self.hscore_a = hscore
                    else:
                        self.hscore_b = hscore
                    retry = True
                    break
            if not retry:
                return q
        return None

    def clone(self):
        g = QuantMatrixGenerator(self.downsample)
        g.hscore_a = self.hscore_a
        g.hscore_b = self.hscore_b
        g.quants = list(self.quants)
        return g

    def add(self, q, dist_ok):
        self.quants.append((q.copy(), dist_ok))
        hscore = quant_matrix_heuristic_score(q)
        if dist_ok:
            self.hscore_a = max(self.hscore_a, hscore)
        else:
            self.hscore_b = (hscore if self.hscore_b == -1.0
                             else min(self.hscore_b, hscore))


class Processor:
    def __init__(self, params: Params, comparator, stats: ProcessStats):
        self.params = params
        self.comparator: Comparator = comparator
        self.stats = stats
        self.final = GuetzliOutput()

    # ---------------------------------------------------------------

    def output_jpeg(self, jpg, dc_histograms=None,
                    ac_histograms=None) -> bytes:
        return jwriter.write_jpeg(jpg, self.params.clear_metadata,
                                  dc_histograms, ac_histograms)

    def maybe_output(self, encoded: bytes):
        score = self.comparator.score_output_size(len(encoded))
        self.stats.log(" Score[%.4f]", score)
        if score < self.final.score or self.final.score < 0:
            self.final.jpeg_data = encoded
            self.final.score = score
            self.stats.log(" (*)")
        self.stats.log("\n")

    def _recoverable(self, dispatch_fn, fetch_fn, pending=None):
        """Run a device fetch with TPU-worker-crash recovery: device
        buffers are rebuilt from host state and the (deterministic)
        dispatch is replayed."""
        if pending is None:
            pending = dispatch_fn()
        for attempt in range(3):
            try:
                return fetch_fn(pending)
            except Exception as e:
                if not is_worker_crash(e) or attempt == 2:
                    raise
                sys.stderr.write("TPU worker crash during compare; "
                                 "recovering\n")
                import time as _time
                _time.sleep(20)
                self.comparator.recover_device_state()
                pending = dispatch_fn()

    def _compare(self, img: st.CoeffImage):
        d = self._recoverable(
            lambda: self.comparator.dispatch_compare(img),
            self.comparator.fetch_compare_plain)
        self.stats.log(" BA[100.00%%] D[%6.4f]", d)
        return d

    # -- quant matrix selection (processor.cc:310-372) ----------------

    def _quant_eval_start(self, jpg_in, q):
        """Prepare + dispatch one quant-matrix trial without side effects
        (so trials can be issued speculatively): build the requantized
        image, dispatch its compare, serialize the candidate JPEG."""
        trial = st.CoeffImage.from_jpeg(jpg_in)
        trial.apply_global_quantization(q)
        pending = self.comparator.dispatch_compare(trial)
        encoded = self.output_jpeg(trial.save_to_jpeg_data(jpg_in))
        return trial, pending, encoded

    def _quant_resolve(self, jpg_in, q, trial, pending, encoded, img,
                       target_mul):
        """Fetch + log + MaybeOutput for a prepared trial, in program
        order (TryQuantMatrix, processor.cc:310-338)."""
        img.comps = trial.comps
        self.stats.inc("iters")
        self.stats.log("Iter %2d: %s quantization matrix:\n",
                       self.stats.counters["iters"], _frame_type_str(img))
        self.stats.log_quant(q)
        self.stats.log("Iter %2d: %s GQ[%5.2f] Out[%7d]",
                       self.stats.counters["iters"], _frame_type_str(img),
                       quant_matrix_heuristic_score(q), len(encoded))
        d = self._recoverable(
            lambda: self.comparator.dispatch_compare(img),
            self.comparator.fetch_compare_plain, pending)
        self.stats.log(" BA[100.00%%] D[%6.4f]", d)
        dist_ok = self.comparator.distance_ok(target_mul)
        self.maybe_output(encoded)
        return dist_ok, len(encoded)

    def select_quant_matrix(self, jpg_in, downsample, best_q,
                            img: st.CoeffImage):
        """SelectQuantMatrix (processor.cc:340-372) with optional 1-deep
        speculation: while a trial's compare is in flight, the successor
        candidates for both outcomes of the binary search are prepared and
        dispatched, so consecutive trials overlap on the device. Results
        are identical to the serial loop (the discarded branch is never
        fetched or logged)."""
        import jax

        from guetzli_tpu import config
        cfg = config.current()
        if cfg.tree_quant is None:
            # The tree speculatively evaluates the whole next search
            # subtree per wave: a win when the round trip dominates (the
            # accelerator), pure extra compute on the compute-bound CPU
            # fallback.
            use_tree = jax.default_backend() != "cpu"
        else:
            use_tree = cfg.tree_quant
        if use_tree and self.comparator.supports_quant_batch():
            # One-fetch wave evaluation of the whole binary-search tree
            # (search/quant_tree.py); identical trial sequence + output.
            from guetzli_tpu.search.quant_tree import \
                select_quant_matrix_tree
            return select_quant_matrix_tree(self, jpg_in, downsample,
                                            best_q, img)
        qgen = QuantMatrixGenerator(downsample)
        target_mul_high = 0.97
        target_mul_low = 0.95
        if cfg.speculate is None:
            # Speculative trials pay ~2x device compute for ~2x less
            # round-trip latency: a win on remote/tunneled accelerators,
            # a loss on the compute-bound CPU backend.
            speculate = jax.default_backend() != "cpu"
        else:
            speculate = cfg.speculate

        cur_q = best_q.copy()
        cur = self._quant_eval_start(jpg_in, cur_q)
        initial = True
        best = None
        while True:
            spec = {}
            if speculate:
                for outcome in ((True, False) if not initial else (True,)):
                    g2 = qgen.clone()
                    if not initial:
                        g2.add(cur_q, outcome)
                    qn = g2.get_next()
                    if qn is not None:
                        spec[outcome] = (g2, qn,
                                         self._quant_eval_start(jpg_in,
                                                                qn))
                if initial and True in spec:
                    # No Add happens for the initial trial: both branches
                    # share the same successor.
                    spec[False] = spec[True]

            dist_ok, size = self._quant_resolve(
                jpg_in, cur_q, *cur, img, target_mul_high)

            if initial:
                best = (cur_q.copy(), dist_ok, size)
                initial = False
            else:
                qgen.add(cur_q, dist_ok)
                better = ((dist_ok and not best[1])
                          or (dist_ok == best[1] and size < best[2]))
                if better:
                    best = (cur_q.copy(), dist_ok, size)
                    if dist_ok and not self.comparator.distance_ok(
                            target_mul_low):
                        break

            if speculate:
                branch = spec.get(dist_ok)
                if branch is None:
                    break
                qgen, cur_q, cur = branch[0], branch[1], branch[2]
            else:
                qn = qgen.get_next()
                if qn is None:
                    break
                cur_q = qn
                cur = self._quant_eval_start(jpg_in, qn)
        best_q[:] = best[0]
        return best[1]

    # -- frequency masking (processor.cc:559-721) ---------------------

    def masking_inputs(self, jpg, img: st.CoeffImage, comp_mask):
        """Per-block current + original coefficients on the pass's grid;
        unmasked channels stay zero (processor.cc:645-658)."""
        last_c = comp_mask.bit_length() - 1
        grid = img.comps[last_c]
        nb = grid.bw * grid.bh
        blocks = np.zeros((nb, 3, 64), dtype=np.int32)
        orig = np.zeros((nb, 3, 64), dtype=np.int32)
        for c in range(3):
            if not (comp_mask & (1 << c)):
                continue
            if c >= len(jpg.components):
                # Grayscale-collapsed jpg: the channel has no data and
                # the CoeffImage chroma is all-zero -- leave the block
                # columns zero (no zeroing candidates). The reference
                # reads jpg.components[c] unguarded here
                # (processor.cc:654) but can't reach this state from its
                # CLI (force_420 is not exposed).
                continue
            comp = img.comps[c]
            assert (comp.bw, comp.bh) == (grid.bw, grid.bh)
            blocks[:, c, :] = comp.coeffs
            jcomp = jpg.components[c]
            src = jcomp.coeffs.reshape(jcomp.height_in_blocks,
                                       jcomp.width_in_blocks, 64)
            orig[:, c, :] = src[:grid.bh, :grid.bw].reshape(nb, 64) \
                .astype(np.int32) \
                * jpg.quant[jcomp.quant_idx].values[None, :]
        return blocks, orig

    def csr_from_zeroing(self, out_idx, out_err, num, nb):
        """CSR candidate arrays (processor.cc:694-716), vectorized."""
        limit = self.comparator.block_error_limit()
        slot = np.arange(out_err.shape[1])[None, :]
        sel = ((slot < num[:, None]) & (out_err > 0)
               & (out_err <= limit))
        counts = sel.sum(axis=1)
        offsets = np.zeros(nb + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        return (offsets, out_idx[sel].astype(np.int32),
                out_err[sel].astype(np.float32))

    def masking_aux(self, img, comp_mask, grid):
        """The pass's frozen per-block evaluation state: (mode, aux) for
        zeroing._eval_dispatch. Starts block comparisons on the
        comparator."""
        import jax

        from guetzli_tpu import config
        cfg = config.current()
        pallas = cfg.pallas
        _dbg = cfg.zeroing_debug
        if _dbg:
            import time as _t
            _t0 = _t.time()
        if pallas is None:
            # Auto: the fused lane-major kernel wins ~20-25% per zeroing
            # wave at production scale on TPU (chained-timing A/B, r04);
            # the CPU backend keeps the XLA path (goldens + interpret
            # cost). Mesh-sharded encodes also stay on the XLA path:
            # GSPMD partitioning of a pallas_call over the lane axis is
            # unvalidated.
            pallas = (2 if jax.default_backend() != "cpu"
                      and self.comparator.mesh is None else 0)
        self.comparator.start_block_comparisons()
        if _dbg:
            import jax as _jax
            _jax.block_until_ready(self.comparator._mask_xyz)
            sys.stderr.write("zeroing-aux: whole-image mask %.2fs\n"
                             % (_t.time() - _t0))
            _t0 = _t.time()
        if img.is_444():
            xyb0_tiles, scales, ysel, xsel = \
                self.comparator.block_state(1, 1)
            if _dbg:
                import jax as _jax
                _jax.block_until_ready(xyb0_tiles)
                sys.stderr.write("zeroing-aux: block state %.2fs\n"
                                 % (_t.time() - _t0))
            if pallas == 1:
                from guetzli_tpu.kernels import tile_compare as tc
                sy, sx = tc._selection_matrices(np.asarray(ysel),
                                                np.asarray(xsel))
                return "444p", (xyb0_tiles, scales, jnp.asarray(sy),
                                jnp.asarray(sx))
            if pallas == 2:
                # Lane-major fused Pallas kernel (Mosaic-compiling
                # formulation, kernels/tile_compare_lanes.py); probe the
                # backend once and degrade to '444l' if lowering fails.
                from guetzli_tpu.kernels import tile_compare_lanes as tcl
                if tcl.mosaic_available():
                    return "444pl", (xyb0_tiles, scales, ysel, xsel)
                return "444l", (xyb0_tiles, scales, ysel, xsel)
            if cfg.lanes:
                # Lane-major evaluation (ops/tiles_lanes.py): same aux
                # arrays; the zeroing stage transposes them once.
                return "444l", (xyb0_tiles, scales, ysel, xsel)
            return "444", (xyb0_tiles, scales, ysel, xsel)
        if comp_mask == 1:
            chroma_bytes = self.comparator.frozen_chroma_blocks(img)
            mode = "420yl" if cfg.lanes else "420y"
            return mode, (chroma_bytes,) + \
                self.comparator.block_state(1, 1)
        from guetzli_tpu.ops import upsample as us
        from guetzli_tpu.ops import image as img_ops
        w, h = img.width, img.height
        ws, hs = (w + 1) // 2, (h + 1) // 2
        geom = getattr(self.comparator, "geom", None)
        subs = []
        for c in (1, 2):
            comp = img.comps[c]
            vals = np.asarray(img_ops.idct_blocks(
                jnp.asarray(comp.coeffs)))
            sub = np.asarray(img_ops.blocks_to_plane(
                jnp.asarray(vals << 4), comp.bw, comp.bh, ws, hs))
            neigh = us.neighborhoods_10x10(sub, comp.bw, comp.bh)
            if geom is not None:
                # Bucket-shaped zeroing program: pad the macroblock axis.
                cbwp, cbhp = geom.wp // 16, geom.hp // 16
                neigh = geom.pad_blocks(
                    np.asarray(neigh).reshape(comp.bw * comp.bh, -1),
                    comp.bw, comp.bh, cbwp, cbhp).reshape(-1, 10, 10)
            subs.append(neigh)
        y16 = self.comparator.frozen_y_16x16(img, grid.bw, grid.bh)
        children = self.comparator.children_state(grid.bw, grid.bh)
        mode = "420cl" if cfg.lanes else "420c"
        return mode, (jnp.asarray(np.asarray(subs[0])),
                      jnp.asarray(np.asarray(subs[1])), y16) \
            + children

    def select_frequency_masking(self, jpg, img: st.CoeffImage, comp_mask,
                                 target_mul, stop_early):
        last_c = comp_mask.bit_length() - 1
        grid = img.comps[last_c]
        nb = grid.bw * grid.bh
        lookahead = self.params.zeroing_greedy_lookahead
        blocks, orig = self.masking_inputs(jpg, img, comp_mask)

        build_aux = lambda: self.masking_aux(img, comp_mask, grid)  # noqa: E731

        # The tunneled TPU worker occasionally crashes mid-program; all
        # device buffers die with it. Search state is host-resident, so
        # recovery = rebuild device state and redo this (deterministic)
        # pass -- the framework-level analog of the reference's per-image
        # fallback output (processor.cc:965-977).
        from guetzli_tpu import config
        # Staged compaction (2-3 device programs, fixed stage shapes) is
        # the default; GUETZLI_TPU_STAGED_ZEROING=0 forces the single
        # full-batch program.
        use_staged = config.current().staged_zeroing
        # Padded-bucket mode: zeroing runs on the bucket block grid so its
        # programs are bucket-shaped too (one compile per bucket).
        geom = getattr(self.comparator, "geom", None)
        if geom is not None:
            factor = grid.factor_x
            gbwp = geom.wp // (8 * factor)
            gbhp = geom.hp // (8 * factor)
            blocks = geom.pad_blocks(
                blocks.reshape(nb, -1), grid.bw, grid.bh, gbwp,
                gbhp).reshape(-1, 3, 64)
            orig = geom.pad_blocks(
                orig.reshape(nb, -1), grid.bw, grid.bh, gbwp,
                gbhp).reshape(-1, 3, 64)

        put = getattr(self.comparator, "_put_blocks", None)
        if put is None or self.comparator.mesh is None:
            put = jnp.asarray
        for attempt in range(3):
            try:
                with self.stats.timed("zeroing_aux"):
                    mode, aux = build_aux()
                limit32 = np.float32(self.comparator.block_error_limit())
                aux_dev = tuple(jnp.asarray(a) for a in aux)
                early = self.params.zeroing_early_exit
                if use_staged:
                    # Device-side CSR compaction: only the selected
                    # candidates cross the link, never the [NB, 192]
                    # rails (device->host is the tunnel's slow
                    # direction). real_index drops bucket-padding rows.
                    if geom is not None:
                        r = np.arange(nb, dtype=np.int64)
                        real_index = ((r // grid.bw) * gbwp
                                      + r % grid.bw)
                    else:
                        real_index = None
                    with self.stats.timed("zeroing_loop"):
                        offsets, cand_idx, cand_err = \
                            zeroing.compute_zeroing_csr_staged(
                                blocks, orig, limit32, aux_dev, mode,
                                comp_mask, real_index=real_index,
                                lookahead=lookahead,
                                new_model=self.params.new_zeroing_model,
                                early_exit=early, put=put)
                else:
                    with self.stats.timed("zeroing_loop"):
                        oi, oe, nn = zeroing.compute_zeroing_order_with(
                            put(blocks), put(orig), limit32, aux_dev,
                            mode, comp_mask, lookahead=lookahead,
                            new_model=self.params.new_zeroing_model,
                            early_exit=early)
                        out_idx, out_err, num = (np.asarray(oi),
                                                 np.asarray(oe),
                                                 np.asarray(nn))
                break
            except Exception as e:
                if not is_worker_crash(e) or attempt == 2:
                    raise
                sys.stderr.write(
                    "TPU worker crash during zeroing; recovering "
                    "(attempt %d)\n" % (attempt + 1))
                import time as _time
                _time.sleep(20)
                self.comparator.recover_device_state()

        if not use_staged:
            if geom is not None:
                out_idx = geom.unpad_blocks(out_idx, grid.bw, grid.bh,
                                            gbwp, gbhp)
                out_err = geom.unpad_blocks(out_err, grid.bw, grid.bh,
                                            gbwp, gbhp)
                num = geom.unpad_blocks(num, grid.bw, grid.bh, gbwp, gbhp)
            offsets, cand_idx, cand_err = self.csr_from_zeroing(
                out_idx, out_err, num, nb)
            del out_idx, out_err, num
        self.comparator.finish_block_comparisons()
        # The (padded copies of) block inputs and aux state are dead once
        # the CSR candidate arrays exist; at 8 MPix they are hundreds of
        # MB that would otherwise sit in RSS through the minutes-long
        # back-end phase (BASELINE 110 B/px envelope).
        del blocks, orig, aux_dev, mode, aux
        if nb * 192 >= 16 << 20:
            import ctypes
            import gc
            gc.collect()
            try:    # glibc: return freed arenas to the OS
                ctypes.CDLL("libc.so.6").malloc_trim(0)
            except Exception:
                pass

        with self.stats.timed("back_end"):
            self.select_frequency_back_end(
                jpg, img, comp_mask, target_mul, stop_early,
                offsets, cand_idx, cand_err)

    # -- back-end up/down loop (processor.cc:723-919) -----------------

    def select_frequency_back_end(self, jpg, img: st.CoeffImage, comp_mask,
                                  target_mul, stop_early,
                                  offsets, cand_idx, cand_err):
        """Driver for back_end_steps: serial (fetch each yielded compare
        immediately, with crash recovery) or pipelined (prefetch-thread
        lag-N protocol) depending on backend/env."""
        lag = _backend_pipeline_lag(self.comparator)
        gen = self.back_end_steps(jpg, img, comp_mask, target_mul,
                                  stop_early, offsets, cand_idx, cand_err,
                                  pipelined=lag)
        if lag:
            return self._drive_back_end_pipelined(gen)
        result = None
        while True:
            try:
                pending, recover = (gen.send(result) if result is not None
                                    else next(gen))
            except StopIteration:
                return
            with self.stats.timed("backend_fetch"):
                result = self._recoverable(
                    recover, self.comparator.fetch_compare, pending)

    def _drive_back_end_pipelined(self, gen):
        """Driver for the pipelined back_end_steps protocol.

        On ("start", pending, recover): begin fetching the dispatched
        compare on a prefetch thread (side-effect-free pull) so the
        tunnel round trip overlaps the next iteration's host work.
        On ("join",): deliver the oldest in-flight result, applying the
        comparator's distance/distmap updates here on the main thread --
        the join points are fixed in the generator's control flow, so
        decisions stay deterministic regardless of fetch timing."""
        import collections
        from concurrent.futures import ThreadPoolExecutor

        comp = self.comparator
        inflight = collections.deque()
        # One worker per pipeline slot: with lag N there can be N fetches
        # in flight, and their round trips only overlap if each gets its
        # own thread (a single worker would serialize them back to one
        # RTT per iteration).
        ex = ThreadPoolExecutor(
            max_workers=max(2, _backend_pipeline_lag(comp)))
        try:
            msg = next(gen)
            while True:
                if msg[0] == "start":
                    _tag, pending, recover = msg
                    # Start streaming the results host-side immediately:
                    # the transfer then overlaps the host work between
                    # dispatch and join instead of paying the full
                    # request round trip inside the join's device_get.
                    for a in (pending[0], pending[2]):
                        try:
                            a.copy_to_host_async()
                        except (AttributeError, RuntimeError):
                            pass
                    fut = ex.submit(comp.fetch_compare_pure, pending)
                    inflight.append((fut, recover))
                    msg = gen.send(None)
                else:                                   # ("join",)
                    fut, recover = inflight.popleft()
                    with self.stats.timed("backend_fetch"):
                        try:
                            d, w4, dmap = fut.result()
                            comp.distance = d
                            comp.distmap = dmap
                            result = (d, w4)
                        except Exception as e:
                            if not is_worker_crash(e):
                                raise
                            # Worker crash: recover THIS join from the
                            # current host state (the re-dispatched
                            # compare reflects the newest flips -- an
                            # extra lag step, crash-only). Other
                            # in-flight futures stay queued: their
                            # joins will fail the same way and recover
                            # individually, keeping the one-join-per-
                            # start pairing with the generator intact.
                            result = self._recoverable(
                                recover, comp.fetch_compare)
                    msg = gen.send(result)
        except StopIteration:
            return
        finally:
            ex.shutdown(wait=True)

    def back_end_steps(self, jpg, img: st.CoeffImage, comp_mask,
                       target_mul, stop_early,
                       offsets, cand_idx, cand_err, pipelined=0):
        """SelectFrequencyBackEnd (processor.cc:723-919) as a generator:
        yields (pending_compare_handle, recover_dispatch) at each
        iteration's fetch point and receives the fetched (distance,
        weights4) via send(). The serial driver fetches immediately; the
        lockstep corpus driver (parallel/lockstep.py) advances every
        image's generator to its yield and pulls ALL compares in one
        combined device_get per round.

        pipelined=N (driven by _drive_back_end_pipelined) switches the
        protocol: after each dispatch the generator yields
        ("start", pending, recover) and continues immediately; when N
        compares are in flight it yields ("join",) to receive the OLDEST
        one's (distance, weights4). Iteration k's order is then built
        from compare k-N's weights (see _backend_pipeline_lag); each
        iteration's output is still MaybeOutput-scored with its own true
        distance at its join. The pipeline drains fully at direction
        switches, so the fresh weights_all_radii there reads the current
        distmap exactly as the serial path does."""
        import collections
        ncomp = len(jpg.components)
        width, height = img.width, img.height
        last_c = comp_mask.bit_length() - 1
        grid = img.comps[last_c]
        factor = grid.factor_x
        bw, bh = grid.bw, grid.bh
        nb = bw * bh

        jpg_out = img.save_to_jpeg_data(jpg)
        jpg_header_size = jwriter.jpeg_header_size(
            jpg_out, self.params.clear_metadata)
        dc_size = hg.estimate_dc_size(jpg_out)
        # DC coefficients are never zeroing candidates (candidate_scores
        # k>=1), so the DC histograms are invariant across the flip loop;
        # the AC histograms are maintained exactly by the flips
        # (UpdateACHistogram, processor.cc:491-515). Reusing both in the
        # per-iteration serialization skips the full-coefficient histogram
        # pass in write_jpeg while producing identical bytes. Guarded on
        # the grayscale-collapse state staying what it was at baseline.
        ncomp_out0 = len(jpg_out.components)
        dc_histograms0 = hg.build_dc_histograms(jpg_out)
        ac_histograms = hg.build_ac_histograms(jpg_out)
        # Incremental serialization is valid while the grayscale-collapse
        # state cannot change. Collapse (3 -> 1 comps) needs BOTH chroma
        # channels all-zero; DC never flips, so a nonzero chroma DC pins
        # the state. Uncollapse (1 -> 3) would need a chroma restore, but
        # all-zero chroma at masking time yields no chroma candidates.
        can_collapse = (
            ncomp_out0 == 3
            and not img.comps[1].coeffs[:, 0].any()
            and not img.comps[2].coeffs[:, 0].any())
        flip_channels = [c for c in range(3) if (comp_mask >> c) & 1]
        while len(ac_histograms) < ncomp:
            ac_histograms.append(hg.new_histogram())
        ac_depths, ac_histogram_size = hg.compute_entropy_codes(ac_histograms)
        base_size = (jpg_header_size + dc_size + ac_histogram_size
                     + hg.entropy_coded_data_size(ac_histograms, ac_depths))
        prev_size = base_size

        max_block_error = np.zeros(nb, dtype=np.float32)
        last_indexes = np.zeros(nb, dtype=np.int64)
        first_up_iter = True
        cached_weights = None
        limit = self.comparator.block_error_limit()

        # Device-resident coefficient state: one full upload here, then
        # each iteration ships only the blocks its flips changed (the
        # scatter is fused into the compare program). ~KBs per round trip
        # instead of the full padded planes.
        from guetzli_tpu import config
        cfg = config.current()
        use_sparse = (cfg.sparse
                      and self.comparator.supports_sparse(img, comp_mask))
        if use_sparse:
            self.comparator.backend_sync_full(img)

        inflight = collections.deque()   # (direction, encoded) per start
        for direction in (1, -1):
            # Direction switch: drain the pipeline so the distmap (and
            # best-output state) is current before fresh weights.
            while inflight:
                d, w4 = yield ("join",)
                dirw, enc = inflight.popleft()
                cached_weights = (dirw, w4)
                self.stats.log(" BA[100.00%%] D[%6.4f]", d)
                self.maybe_output(enc)
            while True:
                while pipelined and len(inflight) >= pipelined:
                    d, w4 = yield ("join",)
                    dirw, enc = inflight.popleft()
                    cached_weights = (dirw, w4)
                    self.stats.log(" BA[100.00%%] D[%6.4f]", d)
                    self.maybe_output(enc)
                if stop_early and direction == -1:
                    if prev_size > 1.01 * len(self.final.jpeg_data):
                        break
                # Build the global order (processor.cc:772-828), vectorized:
                # per block, candidates [last_index, num) for up or
                # [last_index) reversed for down, valued by error delta over
                # block weight.
                _t_order = self.stats.timed("backend_order")
                _t_order.__enter__()
                block_weight = None
                order_blocks = order_vals = None
                blocks_to_change = 0
                ncand_total = len(cand_err)
                clamped_off = np.clip(offsets[:nb], 0,
                                      max(ncand_total - 1, 0))
                # True per-block counts from the UNclamped offsets: with
                # the clamped base, a trailing block whose CSR range is
                # empty (offsets[b] == M) would fabricate one candidate
                # aliasing the last real entry, and the flip loop could
                # zero a coefficient the zeroing phase never validated.
                num_candidates = offsets[1:] - offsets[:nb]
                if first_up_iter:
                    # Zero distmap: direction is +1 and every block's max
                    # distance is 0 <= target, so all weights are 1.
                    weights4 = np.ones((4, nb), dtype=np.float32)
                elif cached_weights is not None and \
                        cached_weights[0] == direction:
                    weights4 = cached_weights[1]
                else:
                    weights4 = self.comparator.weights_all_radii(
                        direction, target_mul, factor, factor)
                for rblock in range(1, 5):
                    block_weight = weights4[rblock - 1]
                    active = block_weight > 0
                    if direction > 0:
                        counts = np.where(
                            active, np.maximum(
                                num_candidates - last_indexes, 0), 0)
                        starts = clamped_off + last_indexes
                        step = 1
                    else:
                        counts = np.where(
                            active, np.maximum(last_indexes, 0), 0)
                        starts = clamped_off + last_indexes - 1
                        step = -1
                    blocks_to_change = int(np.count_nonzero(counts))
                    total = int(counts.sum())
                    if total:
                        order_blocks = np.repeat(
                            np.arange(nb, dtype=np.int64), counts)
                        within = (np.arange(total, dtype=np.int64)
                                  - np.repeat(np.cumsum(counts)
                                              - counts, counts))
                        pos = np.repeat(starts, counts) + step * within
                        err = cand_err[pos]
                        mbe = max_block_error[order_blocks]
                        bwt = block_weight[order_blocks]
                        order_vals = (np.float32(direction)
                                      * (err - mbe) / bwt)
                        break
                if order_blocks is None:
                    _t_order.__exit__(None, None, None)
                    break

                sort_ix = np.argsort(order_vals, kind="stable")
                order_blocks = order_blocks[sort_ix]
                order_vals = order_vals[sort_ix]
                _t_order.__exit__(None, None, None)

                rel_size_delta = 0.01 if direction > 0 else 0.0005
                if direction > 0 and self.comparator.distance_ok(1.0):
                    rel_size_delta = 0.05
                min_size_delta = base_size * rel_size_delta
                coeffs_to_change_per_block = (
                    2.0 if direction > 0 else factor * factor * 0.2)
                min_coeffs_to_change = int(
                    coeffs_to_change_per_block * blocks_to_change)

                if first_up_iter:
                    # partition_point on the sorted values (:840-848).
                    cnt = int(np.searchsorted(order_vals,
                                              np.float32(0.75 * limit),
                                              side="left"))
                    min_coeffs_to_change = max(min_coeffs_to_change, cnt)
                    first_up_iter = False

                li_before = last_indexes.copy()
                _t_flips = self.stats.timed("backend_flips")
                _t_flips.__enter__()
                flips = self._run_flips_native(
                    img, jpg, bw, offsets, cand_idx, cand_err,
                    last_indexes, order_blocks, order_vals, direction,
                    min_coeffs_to_change, min_size_delta, prev_size,
                    jpg_header_size, dc_size, ac_histograms, ac_depths,
                    ac_histogram_size, nb)
                if flips is not None:
                    (est_jpg_size, changed_coeffs, val_threshold,
                     n_changed_blocks, ac_depths,
                     ac_histogram_size, flip_triplets) = flips
                else:
                    flip_triplets = None
                    (est_jpg_size, changed_coeffs, val_threshold,
                     n_changed_blocks, ac_depths, ac_histogram_size) = \
                        self._run_flips_python(
                            img, jpg, bw, offsets, cand_idx, cand_err,
                            last_indexes, order_blocks, order_vals,
                            direction, min_coeffs_to_change,
                            min_size_delta, prev_size, jpg_header_size,
                            dc_size, ac_histograms, ac_depths,
                            ac_histogram_size)

                _t_flips.__exit__(None, None, None)
                max_block_error += (np.asarray(block_weight)
                                    * val_threshold * direction)

                self.stats.inc("iters")
                self.stats.inc("iters_up" if direction > 0
                               else "iters_down")
                if flip_triplets is not None:
                    # The native loop emitted the exact flip triplets;
                    # the sorted-unique flipped blocks replace the
                    # last_indexes diff.
                    bs, slots, vals = flip_triplets
                    bs = bs.astype(np.int64)
                    changed = np.unique(bs)
                else:
                    changed = np.nonzero(last_indexes != li_before)[0]
                # Overlap the device round trip with host serialization.
                if use_sparse:
                    if flip_triplets is None:
                        # Fallback (python flip loop): reconstruct the
                        # flipped-coefficient triplets from the
                        # last_indexes deltas, values re-read from the
                        # post-flip host state. ~8 B per flipped
                        # coefficient on the wire either way.
                        lo = np.minimum(li_before, last_indexes)[changed]
                        cnt = (np.maximum(li_before,
                                          last_indexes)[changed] - lo)
                        tot = int(cnt.sum())
                        bs = np.repeat(changed, cnt)
                        within = (np.arange(tot, dtype=np.int64)
                                  - np.repeat(np.cumsum(cnt) - cnt, cnt))
                        slots = cand_idx[
                            np.repeat(clamped_off[changed] + lo, cnt)
                            + within]
                        vals = np.empty(tot, np.int32)
                        for _ch in range(3):
                            _m = (slots >> 6) == _ch
                            if _m.any():
                                vals[_m] = img.comps[_ch].coeffs[
                                    bs[_m], slots[_m] & 63]

                    def dispatch():
                        # (chunked: handles arbitrarily large flip waves)
                        return self.comparator \
                            .dispatch_compare_sparse_coeffs(
                                img, bs, slots, vals, direction,
                                target_mul, factor, factor)
                else:
                    dispatch = lambda: self.comparator \
                        .dispatch_compare_with_weights(
                            img, direction, target_mul, factor,
                            factor)  # noqa: E731
                with self.stats.timed("backend_dispatch"):
                    pending = dispatch()
                with self.stats.timed("backend_serialize"):
                    if not can_collapse and cfg.incr_save:
                        img.update_jpeg_data(jpg_out, changed,
                                             flip_channels, bw)
                    else:
                        jpg_out = img.save_to_jpeg_data(jpg)
                    if (len(jpg_out.components) == ncomp_out0
                            and cfg.histo_reuse):
                        encoded = self.output_jpeg(
                            jpg_out, dc_histograms0,
                            ac_histograms[:ncomp_out0])
                    else:
                        encoded = self.output_jpeg(jpg_out)
                if nb >= 1 << 14 and \
                        self.stats.counters["iters"] % 8 == 0:
                    # Multi-MPix flip loops churn tens of MB of numpy per
                    # iteration; glibc grows arenas instead of returning
                    # them, so RSS creeps through the minutes-long phase.
                    import ctypes
                    try:
                        ctypes.CDLL("libc.so.6").malloc_trim(0)
                    except Exception:
                        pass
                self.stats.log(
                    "Iter %2d: (%d) %s Coeffs[%d/%d] Blocks[%d/%d/%d] "
                    "ValThres[%.4f] Out[%7d] EstErr[%.2f%%]",
                    self.stats.counters["iters"], comp_mask,
                    "up" if direction > 0 else "down", changed_coeffs,
                    len(order_blocks), n_changed_blocks,
                    blocks_to_change, nb, val_threshold, len(encoded),
                    100.0 - (100.0 * est_jpg_size) / len(encoded))
                def recover_dispatch():
                    if use_sparse:
                        # Device buffers died with the worker; host img is
                        # authoritative -- re-upload, then a no-op delta.
                        self.comparator.backend_sync_full(img)
                        return self.comparator.dispatch_compare_sparse(
                            img, np.empty(0, np.int64), direction,
                            target_mul, factor, factor)
                    return self.comparator.dispatch_compare_with_weights(
                        img, direction, target_mul, factor, factor)

                if pipelined:
                    inflight.append((direction, encoded))
                    yield ("start", pending, recover_dispatch)
                else:
                    d, w4 = yield (pending, recover_dispatch)
                    cached_weights = (direction, w4)
                    self.stats.log(" BA[100.00%%] D[%6.4f]", d)
                    self.maybe_output(encoded)
                prev_size = est_jpg_size
        # End of both directions: score any still-pending outputs.
        while inflight:
            d, w4 = yield ("join",)
            _dirw, enc = inflight.popleft()
            self.stats.log(" BA[100.00%%] D[%6.4f]", d)
            self.maybe_output(enc)

    def _run_flips_native(self, img, jpg, bw, offsets, cand_idx, cand_err,
                          last_indexes, order_blocks, order_vals,
                          direction, min_coeffs_to_change, min_size_delta,
                          prev_size, jpg_header_size, dc_size,
                          ac_histograms, ac_depths, ac_histogram_size, nb):
        """C++ flip loop (native.cc gt_backend_flips); None if no lib."""
        import ctypes

        from guetzli_tpu import native
        lib = native.get_lib()
        if lib is None:
            return None
        ncomp = len(ac_histograms)
        coeff_ptrs = (ctypes.POINTER(ctypes.c_int32) * 3)()
        jpg_ptrs = (ctypes.POINTER(ctypes.c_int16) * 3)()
        jpg_wib = (ctypes.c_int * 3)()
        quant = np.ascontiguousarray(img.quant, dtype=np.int32)
        jpg_quant = np.stack([
            jpg.quant[c.quant_idx].values.astype(np.int32)
            for c in jpg.components] + [np.zeros(64, np.int32)] * (
                3 - len(jpg.components)))
        jpg_bufs = []
        for c in range(3):
            comp = img.comps[c]
            comp.coeffs = np.ascontiguousarray(comp.coeffs, dtype=np.int32)
            coeff_ptrs[c] = comp.coeffs.ctypes.data_as(
                ctypes.POINTER(ctypes.c_int32))
            if c < len(jpg.components):
                buf = np.ascontiguousarray(jpg.components[c].coeffs,
                                           dtype=np.int16)
                jpg_bufs.append(buf)
                jpg_ptrs[c] = buf.ctypes.data_as(
                    ctypes.POINTER(ctypes.c_int16))
                jpg_wib[c] = jpg.components[c].width_in_blocks
        histo = np.ascontiguousarray(np.stack(ac_histograms),
                                     dtype=np.int64)
        depths = np.ascontiguousarray(ac_depths, dtype=np.uint8)
        if depths.shape[0] < ncomp:
            depths = np.zeros((ncomp, 257), dtype=np.uint8)
        hist_size = ctypes.c_int64(int(ac_histogram_size))
        out_coeffs = ctypes.c_int64(0)
        out_thresh = ctypes.c_double(0.0)
        out_blocks = ctypes.c_int64(0)
        # Exact flip triplets, emitted by the loop itself (capacity =
        # the order length, an upper bound on flips this iteration).
        flip_b = np.empty(len(order_blocks), dtype=np.int32)
        flip_idx = np.empty(len(order_blocks), dtype=np.int32)
        flip_val = np.empty(len(order_blocks), dtype=np.int32)
        offsets64 = np.ascontiguousarray(offsets, dtype=np.int64)
        li = np.ascontiguousarray(last_indexes, dtype=np.int64)
        ob = np.ascontiguousarray(order_blocks, dtype=np.int32)
        ov = np.ascontiguousarray(order_vals, dtype=np.float32)
        ci = np.ascontiguousarray(cand_idx, dtype=np.int32)
        ce = np.ascontiguousarray(cand_err, dtype=np.float32)
        est = lib.gt_backend_flips(
            coeff_ptrs, quant.ctypes.data_as(
                ctypes.POINTER(ctypes.c_int32)),
            jpg_ptrs, jpg_quant.ctypes.data_as(
                ctypes.POINTER(ctypes.c_int32)),
            jpg_wib, ctypes.c_int(bw),
            offsets64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ci.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ce.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int64(len(ci)),
            li.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ob.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ov.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int64(len(ob)), ctypes.c_int(direction),
            ctypes.c_int64(int(min_coeffs_to_change)),
            ctypes.c_double(float(min_size_delta)),
            ctypes.c_int64(int(prev_size)),
            ctypes.c_int64(int(jpg_header_size)),
            ctypes.c_int64(int(dc_size)),
            histo.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            depths.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.byref(hist_size), ctypes.c_int(ncomp),
            ctypes.c_int64(nb),
            ctypes.byref(out_coeffs), ctypes.byref(out_thresh),
            ctypes.byref(out_blocks),
            flip_b.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            flip_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            flip_val.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        last_indexes[:] = li
        for c in range(ncomp):
            ac_histograms[c][:] = histo[c]
        m = int(out_coeffs.value)
        return (int(est), m, float(out_thresh.value),
                int(out_blocks.value), depths, int(hist_size.value),
                (flip_b[:m], flip_idx[:m], flip_val[:m]))

    def _run_flips_python(self, img, jpg, bw, offsets, cand_idx, cand_err,
                          last_indexes, order_blocks, order_vals,
                          direction, min_coeffs_to_change, min_size_delta,
                          prev_size, jpg_header_size, dc_size,
                          ac_histograms, ac_depths, ac_histogram_size):
        """Pure-Python flip loop (processor.cc:854-889)."""
        changed_blocks = set()
        val_threshold = 0.0
        changed_coeffs = 0
        est_jpg_size = prev_size
        ncand_total = len(cand_idx)
        for i in range(len(order_blocks)):
            b = int(order_blocks[i])
            last_idx = int(last_indexes[b])
            offset = max(0, min(int(offsets[b]), ncand_total - 1))
            idx = int(cand_idx[offset + last_idx + min(direction, 0)])
            c = idx // 64
            k = idx % 64
            quant_c = img.comps[c].quant
            jcomp = jpg.components[c]
            jpg_block_ix = (b // bw) * jcomp.width_in_blocks + (b % bw)
            if direction > 0:
                newval = 0
            else:
                newval = int(st.quantize(
                    int(jcomp.coeffs[jpg_block_ix, k])
                    * int(jpg.quant[jcomp.quant_idx].values[k]),
                    int(quant_c[k])))
            block = img.comps[c].coeffs[b].copy()
            hg.update_ac_histogram(-1, block, quant_c, ac_histograms[c])
            block[k] = newval
            hg.update_ac_histogram(1, block, quant_c, ac_histograms[c])
            img.comps[c].coeffs[b] = block
            last_indexes[b] += direction
            changed_blocks.add(b)
            val_threshold = float(order_vals[i])
            changed_coeffs += 1
            if i % 10 == 0:
                ac_depths, ac_histogram_size = \
                    hg.compute_entropy_codes(ac_histograms)
            est_jpg_size = (jpg_header_size + dc_size + ac_histogram_size
                            + hg.entropy_coded_data_size(ac_histograms,
                                                         ac_depths))
            if (changed_coeffs > min_coeffs_to_change
                    and abs(est_jpg_size - prev_size) > min_size_delta):
                break
        return (est_jpg_size, changed_coeffs, val_threshold,
                len(changed_blocks), ac_depths, ac_histogram_size)

    # -- top-level (processor.cc:931-1020) ----------------------------

    def process_jpeg_data(self, jpg_in: jd.JpegData) -> bool:
        if self.params.butteraugli_target > 2.0:
            sys.stderr.write(
                "Guetzli should be called with quality >= 84.\n")
            return False
        if len(jpg_in.components) != 3:
            sys.stderr.write("Only YUV color space input jpeg supported\n")
            return False
        if jpg_in.is_444():
            input_is_420 = False
        elif jpg_in.is_420():
            input_is_420 = True
        else:
            sys.stderr.write("Unsupported sampling factors\n")
            return False

        encoded = self.output_jpeg(jpg_in)
        self.final.score = -1
        self.stats.log("Original Out[%7d]", len(encoded))
        if self.comparator is None:
            self.stats.log(" <image too small for Butteraugli>\n")
            self.final.jpeg_data = encoded
            self.final.score = len(encoded)
            return True

        jpg = _copy_jpeg(jpg_in)
        q_in = st.remove_original_quantization(jpg)
        img = st.CoeffImage.from_jpeg(jpg)
        self._compare(img)
        self.maybe_output(encoded)

        try_420 = 1 if (input_is_420 or self.params.force_420
                        or (self.params.try_420
                            and not _is_grayscale(jpg_in))) else 0
        force_420 = 1 if (input_is_420 or self.params.force_420) else 0
        try:
            self._run_search(jpg_in, q_in, force_420, try_420)
        except Exception as e:
            # The original/requantized output was emitted before the search
            # started, so a failed search still yields valid output -- the
            # reference's resilience model (processor.cc:965-977).
            if not self.final.jpeg_data:
                raise
            self.stats.search_error = str(e)
            sys.stderr.write(
                "search failed (%s); emitting best output so far\n" % e)
        return True

    def _run_search(self, jpg_in, q_in, force_420, try_420):
        for downsample in range(force_420, try_420 + 1):
            jpg = _copy_jpeg(jpg_in)
            st.remove_original_quantization(jpg)
            img = st.CoeffImage.from_jpeg(jpg)
            if downsample:
                if img.comps[1].factor_x == 1 and \
                        img.comps[1].factor_y == 1:
                    img.downsample(
                        use_silver_screen=self.params.use_silver_screen)
                jpg = img.save_to_jpeg_data(jpg)
            best_q = q_in.copy()
            with self.stats.timed("select_quant_matrix"):
                ok = self.select_quant_matrix(jpg, downsample != 0,
                                              best_q, img)
            if not ok:
                best_q[:] = 1
            img.comps = st.CoeffImage.from_jpeg(jpg).comps
            img.apply_global_quantization(best_q)
            with self.stats.timed("select_frequency_masking"):
                if not downsample:
                    self.select_frequency_masking(jpg, img, 7, 1.0, False)
                else:
                    ymul = 1.0 if len(jpg.components) == 1 else 0.97
                    self.select_frequency_masking(jpg, img, 1, ymul,
                                                  False)
                    self.select_frequency_masking(jpg, img, 6, 1.0, True)
        return True


def _frame_type_str(img) -> str:
    """OutputImage::FrameTypeStr (output_image.cc:718-725)."""
    return "f" + "".join("%d%d" % (c.factor_x, c.factor_y)
                         for c in img.comps)


def _copy_jpeg(jpg: jd.JpegData) -> jd.JpegData:
    import copy
    out = copy.copy(jpg)
    out.components = [
        jd.Component(id=c.id, h_samp_factor=c.h_samp_factor,
                     v_samp_factor=c.v_samp_factor, quant_idx=c.quant_idx,
                     width_in_blocks=c.width_in_blocks,
                     height_in_blocks=c.height_in_blocks,
                     coeffs=c.coeffs.copy())
        for c in jpg.components]
    out.quant = [jd.QuantTable(t.values.copy(), t.precision, t.index,
                               t.is_last) for t in jpg.quant]
    out.app_data = list(jpg.app_data)
    out.com_data = list(jpg.com_data)
    return out


def _is_grayscale(jpg: jd.JpegData) -> bool:
    return all(not np.any(jpg.components[c].coeffs) for c in (1, 2))


def decode_jpeg_to_rgb(jpg: jd.JpegData):
    """DecodeJpegToRGB (jpeg_data_decoder.cc:45-53): interleaved sRGB bytes
    or None for unsupported colorspaces/samplings."""
    from guetzli_tpu.codec import reader
    from guetzli_tpu.ops import image as img_ops
    if len(jpg.components) != 3 or not reader.has_ycbcr_colorspace(jpg):
        return None
    if jpg.is_444():
        img = st.CoeffImage.from_jpeg(jpg)
        srgb = np.asarray(img_ops.coeffs_to_srgb(
            img.coeffs, img.bw, img.bh, img.width, img.height))
        return srgb.transpose(1, 2, 0).astype(np.uint8)
    if jpg.is_420():
        img = st.CoeffImage.from_jpeg(jpg)
        y, u, v = img.comps
        import jax.numpy as jnp
        srgb = np.asarray(img_ops.coeffs420_to_srgb(
            jnp.asarray(y.coeffs), jnp.asarray(u.coeffs),
            jnp.asarray(v.coeffs), y.bw, y.bh, u.bw, u.bh,
            img.width, img.height))
        return srgb.transpose(1, 2, 0).astype(np.uint8)
    return None


def process_jpeg_bytes(params: Params, data: bytes,
                       stats: ProcessStats = None):
    """guetzli::Process for JPEG input (processor.cc:1029-1066)."""
    from guetzli_tpu.codec import reader
    stats = stats or ProcessStats()
    try:
        jpg = reader.read_jpeg(data)
    except reader.JpegError as e:
        sys.stderr.write("Can't read jpg data from input file: %s\n" % e)
        return None
    if not reader.check_jpeg_sanity(jpg):
        sys.stderr.write("Unsupported input JPEG (unexpectedly large "
                         "coefficient values).\n")
        return None
    rgb = decode_jpeg_to_rgb(jpg)
    if rgb is None:
        # ProcessUnsupportedJpegData (processor.cc:1069-1153): CMYK/YCCK,
        # exotic sampling (422/411/...), grayscale etc. are decoded to RGB
        # by libjpeg and re-encoded from pixels.
        return process_unsupported_jpeg_bytes(params, data, stats)
    comparator = None
    if jpg.width >= 32 and jpg.height >= 32:
        comparator = Comparator(rgb, jpg.width, jpg.height,
                                params.butteraugli_target)
    proc = Processor(params, comparator, stats)
    if not proc.process_jpeg_data(jpg):
        return None
    return proc.final.jpeg_data


def process_unsupported_jpeg_bytes(params: Params, data: bytes,
                                   stats: ProcessStats = None):
    """ProcessUnsupportedJpegData (processor.cc:1069-1153).

    JPEGs outside the 3-component YCbCr 444/420 fast path (CMYK, YCCK,
    4:2:2/4:1:1 sampling, grayscale, RGB-tagged) are decoded to RGB pixels
    in-tree (codec/full_decode.py: libjpeg-exact islow IDCT + fancy
    upsampling + the reference's (c*k+c+128)>>8 CMYK formula,
    processor.cc:1069-1086) and re-enter the pixel pipeline. PIL remains
    a test oracle only.
    """
    from guetzli_tpu.codec import full_decode, reader
    try:
        jpg = reader.read_jpeg(data)
        rgb, w, h = full_decode.decode_any_to_rgb(jpg)
    except (reader.JpegError, ValueError) as e:
        sys.stderr.write("Can't decode unsupported JPEG: %s\n" % e)
        return None
    try:
        return process_rgb(params, rgb, w, h, stats)
    except ValueError:
        return None


def process_rgb(params: Params, rgb, w, h,
                stats: ProcessStats = None) -> bytes:
    """guetzli::Process for RGB input (processor.cc:1157-1185)."""
    stats = stats or ProcessStats()
    jpg = encode_rgb_to_jpeg(rgb, w, h)
    comparator = None
    if w >= 32 and h >= 32:
        comparator = Comparator(rgb, w, h, params.butteraugli_target)
    proc = Processor(params, comparator, stats)
    if not proc.process_jpeg_data(jpg):
        raise ValueError("processing failed")
    return proc.final.jpeg_data
