"""Batched per-block coefficient zeroing order.

TPU redesign of Processor::ComputeBlockZeroingOrder (processor.cc:376-487)
and its GPU twin clComputeBlockZeroingOrderEx (clguetzli.cl:752-879): the
reference runs a greedy serial loop per macroblock (one CPU iteration / one
GPU work-item per block). Here the loop over blocks is vectorized -- a
single `lax.while_loop` advances *all* blocks one greedy step per iteration,
evaluating every block's `lookahead` candidates through the batched
tile-compare pipeline, and masks out blocks whose candidate list is
exhausted. The per-block sequential dependency (each zeroed coefficient
changes the next evaluation) is preserved exactly; only the embarrassing
block parallelism is mapped onto the vector units.

Output mirrors the reference contract: per block, the order in which AC
coefficients were zeroed with the (monotonic, suffix-min) block error after
each removal, cut off at the block error limit.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from guetzli_tpu import consts
from guetzli_tpu.ops import tiles as tile_ops

K = 192  # 3 * 64 candidate slots per block


def candidate_scores(blocks, orig_blocks, comp_mask, new_model=True):
    """Zeroing priority of each (channel, coeff) slot (processor.cc:393-409).

    Lower score = zeroed earlier. Invalid slots (DC, zero coeffs, masked
    channels) get +inf.
    """
    nb = blocks.shape[0]
    csf = jnp.asarray(consts.ZEROING_CSF)          # [3, 64]
    bias = jnp.asarray(consts.ZEROING_BIAS)
    old_csf = jnp.asarray(consts.OLD_CSF)          # [64]
    weight = jnp.asarray(consts.ZEROING_OLD_WEIGHT)
    zigzag = jnp.asarray(consts.JPEG_ZIGZAG_ORDER.astype(np.float32))

    absorig = jnp.abs(orig_blocks).astype(jnp.float32)   # [NB, 3, 64]
    if new_model:
        score = absorig * csf[None] + bias[None]
    else:
        score = ((absorig - zigzag[None, None] / 64.0)
                 * weight[None, :, None] / old_csf[None, None])

    chan_ok = jnp.asarray(
        [(comp_mask >> c) & 1 for c in range(3)], dtype=bool)
    k_ok = jnp.arange(64) >= 1
    valid = (blocks != 0) & chan_ok[None, :, None] & k_ok[None, None, :]
    return jnp.where(valid, score, jnp.inf).reshape(nb, K)


def candidate_scores_host(blocks, orig_blocks, comp_mask, new_model=True):
    """Numpy twin of candidate_scores with identical float32 elementwise
    semantics (no reductions, so results are bit-equal to the device
    version)."""
    nb = blocks.shape[0]
    absorig = np.abs(orig_blocks).astype(np.float32)
    if new_model:
        score = (absorig * np.float32(consts.ZEROING_CSF)[None]
                 + np.float32(consts.ZEROING_BIAS)[None])
    else:
        zigzag = consts.JPEG_ZIGZAG_ORDER.astype(np.float32)
        score = ((absorig - zigzag[None, None] / np.float32(64.0))
                 * np.float32(consts.ZEROING_OLD_WEIGHT)[None, :, None]
                 / np.float32(consts.OLD_CSF)[None, None])
    chan_ok = np.array([(comp_mask >> c) & 1 for c in range(3)], bool)
    k_ok = np.arange(64) >= 1
    valid = (blocks != 0) & chan_ok[None, :, None] & k_ok[None, None, :]
    return np.where(valid, score, np.inf).reshape(nb, K)


def _eval_dispatch(mode, cand, aux, lookahead):
    """Evaluate candidate tiles [NB*L, 3, 64] under the pass's frozen
    state `aux` (a tuple of device arrays, PRE-REPEATED to the candidate
    axis by _rep_aux -- hoisting the repeat out of the greedy loop).
    `mode` is static: '444l' (lane-major, the default), '444', '444p'
    (fused Pallas kernel), '420y', or '420c'."""
    if mode == "444l":
        # Tiles-last evaluation (ops/tiles_lanes.py): aux was transposed
        # once per stage by _rep_aux.
        from guetzli_tpu.ops import tiles_lanes as tl
        return tl.compare_blocks_lanes444(cand, *aux)
    if mode == "420yl":
        from guetzli_tpu.ops import tiles_lanes as tl
        return tl.compare_blocks_lanes420y(cand[:, 0], *aux)
    if mode == "420cl":
        from guetzli_tpu.ops import tiles_lanes as tl
        return tl.compare_blocks_lanes420c(cand[:, 1], cand[:, 2], *aux)
    if mode == "444":
        xyb0_tiles, scales, ysel, xsel = aux
        lin = tile_ops.tiles_to_linear_rgb(cand, xsel, ysel)
        return tile_ops.compare_blocks(xyb0_tiles, lin, scales)
    if mode == "444p":
        from guetzli_tpu.kernels import tile_compare as tc
        xyb0_tiles, scales, sy, sx = aux
        n = cand.shape[0]
        npad = (-n) % tc.TILE
        pad = lambda a: jnp.concatenate(
            [a, jnp.zeros((npad,) + a.shape[1:], a.dtype)]) if npad else a
        errs = tc.tile_compare_pallas(
            pad(cand), pad(xyb0_tiles), pad(scales), pad(sy), pad(sx))
        return errs[:n]
    if mode == "444pl":
        # Fused lane-major Pallas kernel (the Mosaic-compiling
        # formulation; GUETZLI_TPU_PALLAS=2). aux was transposed to
        # tiles-last and lane-padded once by _rep_aux; only the
        # candidate transpose+pad remains per greedy iteration.
        from guetzli_tpu.kernels import tile_compare_lanes as tcl
        n = cand.shape[0]
        npad = (-n) % tcl.TILE_N
        cand_t = jnp.transpose(
            jnp.reshape(cand, (-1, 3, 8, 8)), (1, 2, 3, 0))
        if npad:
            cand_t = jnp.pad(cand_t, ((0, 0),) * 3 + ((0, npad),))
        errs = tcl._tile_compare_lanes(
            cand_t, *aux, interpret=jax.default_backend() == "cpu")
        return errs[:n]
    if mode == "420y":
        chroma_bytes, xyb0_tiles, scales, ysel, xsel = aux
        return tile_ops.compare_blocks_420y(
            cand[:, 0], chroma_bytes, xyb0_tiles, scales, ysel, xsel)
    if mode == "420c":
        return tile_ops.compare_blocks_420c(cand[:, 1], cand[:, 2], *aux)
    raise ValueError(mode)


def _rep_aux(aux, lookahead, mode=None):
    """Repeat every frozen-state array to the [NB * L] candidate axis,
    once, outside the greedy loop. The staged driver keeps aux in the
    standard blocks-leading layout (its permute/compact steps index axis
    0); for the lane-major mode the transpose to tiles-last happens here,
    also once per stage program."""
    if mode in ("444l", "420yl", "420cl"):
        from guetzli_tpu.ops import tiles_lanes as tl
        tr = {"444l": tl.transpose_aux_444,
              "420yl": tl.transpose_aux_420y,
              "420cl": tl.transpose_aux_420c}[mode]
        aux = tr(*aux)
        return tuple(jnp.repeat(a, lookahead, axis=-1) for a in aux)
    if mode == "444pl":
        # The fused Pallas kernel's aux: tiles-last, ymax/xmax rank-2,
        # lane axis repeated AND padded to the kernel tile once per
        # stage program instead of per greedy iteration.
        from guetzli_tpu.kernels import tile_compare_lanes as tcl
        from guetzli_tpu.ops import tiles_lanes as tl
        x0, sc, ymax, xmax = tl.transpose_aux_444(*aux)
        out = tuple(jnp.repeat(a, lookahead, axis=-1)
                    for a in (x0, sc, ymax[None, :], xmax[None, :]))
        npad = (-out[0].shape[-1]) % tcl.TILE_N
        if npad:
            out = tuple(
                jnp.pad(a, ((0, 0),) * (a.ndim - 1) + ((0, npad),))
                for a in out)
        return out
    return tuple(jnp.repeat(a, lookahead, axis=0) for a in aux)


@partial(jax.jit, static_argnames=("mode", "comp_mask", "lookahead",
                                   "early_exit"), donate_argnums=(0,))
def _zeroing_stage(state, limit, aux, mode, comp_mask, lookahead,
                   early_exit, max_t):
    """Advance the greedy loop until iteration `max_t` (or all done).

    `state` = (processed [S,3,64], order [S,K], n_remaining [S],
    out_idx [S,K], out_err [S,K], t); see compute_zeroing_order_with.

    The aux repeat/transpose stays INSIDE this jit deliberately: XLA
    fuses it into the eval as an index transform (a free broadcast);
    materializing the repeated [.., S*L] aux eagerly and passing it as
    arguments measured ~1.6x SLOWER per iteration at 2 MPix (the eval
    then streams the full-size aux from HBM every iteration).
    """
    nb = state[0].shape[0]
    aux_rep = _rep_aux(aux, lookahead, mode)

    def eval_batch(cand):
        return _eval_dispatch(mode, cand, aux_rep, lookahead)

    def body(state):
        processed, order, n_remaining, out_idx, out_err, t = state
        active = n_remaining > 0
        flat = processed.reshape(nb, K)

        idxs = order[:, :lookahead]                            # [S, L]
        cand = (flat[:, None, :]
                * (1 - jax.nn.one_hot(idxs, K, dtype=jnp.int32)))
        cand = cand.reshape(nb * lookahead, 3, 64)
        errs = eval_batch(cand).reshape(nb, lookahead)
        l_valid = jnp.arange(lookahead)[None, :] < n_remaining[:, None]
        errs = jnp.where(l_valid, errs, jnp.inf)

        best_l = jnp.argmin(errs, axis=1).astype(jnp.int32)
        best_err = jnp.min(errs, axis=1)
        # order[i, best_l[i]] without a gather: best_l < lookahead, so a
        # select over the first L columns suffices (gathers serialize on
        # the scalar core inside the loop).
        best_idx = jnp.sum(
            jnp.where(jnp.arange(lookahead,
                                 dtype=jnp.int32)[None, :] == best_l[:,
                                                                     None],
                      idxs, 0), axis=1)

        zero_mask = jax.nn.one_hot(best_idx, K, dtype=jnp.int32)
        new_flat = jnp.where(active[:, None], flat * (1 - zero_mask), flat)

        # Remove position best_l by shifting the tail left: a select
        # between `order` and its static left-shift (clamped at K-1).
        j = jnp.arange(K, dtype=jnp.int32)[None, :]
        shifted = jnp.concatenate([order[:, 1:], order[:, -1:]], axis=1)
        new_order = jnp.where(active[:, None] & (j >= best_l[:, None]),
                              shifted, order)

        out_idx = out_idx.at[:, t].set(jnp.where(active, best_idx, 0))
        out_err = out_err.at[:, t].set(jnp.where(active, best_err,
                                                 jnp.inf))

        if early_exit:
            stop = active & (best_err >= limit)
        else:
            stop = jnp.zeros_like(active)
        new_remaining = jnp.where(stop, 0,
                                  n_remaining - active.astype(jnp.int32))
        return (new_flat.reshape(nb, 3, 64), new_order, new_remaining,
                out_idx, out_err, t + 1)

    def cond(state):
        _, _, n_remaining, _, _, t = state
        return jnp.logical_and(jnp.any(n_remaining > 0), t < max_t)

    return jax.lax.while_loop(cond, body, state)


@partial(jax.jit, donate_argnums=(0,))
def _bank_rows(bank, rows, start):
    """bank[start:start+len(rows)] = rows, in place (donated)."""
    return jax.lax.dynamic_update_slice(
        bank, rows, (jnp.int32(start), jnp.int32(0)))


# Fixed stage sizes: every stage executable after the full-batch one has a
# geometry-independent shape, so the (expensive, remote) compilation is
# paid once ever, not once per image. Denser ladder = device work tracks
# the sorted candidate-count curve tighter (1.34x -> 1.17x of the ideal
# area on a 1 MPix photo) at the cost of one more stage transition.
_STAGE_SIZES = (8192, 2048, 512)


def _staged_core(blocks, orig_blocks, limit, aux, mode, comp_mask,
                 lookahead, new_model, early_exit, put):
    """Shared stage-ladder driver: runs the greedy loop with staged
    compaction, banking finished rows into DEVICE-resident [NB, K]
    buffers (rows in candidate-count-sorted order). Returns
    (bank_idx_dev, bank_err_dev, perm, inv_perm, limit_np).

    GUETZLI_TPU_ZEROING_DEBUG=1 prints per-stage walls to stderr."""
    import time as _t
    _t0_dbg = _t.time()
    if put is None:
        put = jnp.asarray
    nb = blocks.shape[0]
    limit = np.asarray(limit, dtype=np.float32)
    per_block_limit = limit.ndim == 1
    chan_ok = np.array([(comp_mask >> c) & 1 for c in range(3)], bool)
    valid = (np.asarray(blocks) != 0) & chan_ok[None, :, None]
    valid[:, :, 0] = False
    n_cand_host = valid.reshape(nb, K).sum(axis=1).astype(np.int64)
    perm = np.argsort(-n_cand_host, kind="stable")
    inv_perm = np.argsort(perm)
    sorted_counts = n_cand_host[perm]

    blocks_perm = np.asarray(blocks)[perm]
    blocks_p = put(blocks_perm)
    aux_p = tuple(put(np.asarray(a)[perm]) for a in aux)
    limit_p = jnp.asarray(limit[perm] if per_block_limit else limit)

    # Scores + initial order on HOST (bit-identical: same f32 elementwise
    # ops, and both np and jnp argsort are stable): uploads a [NB, K]
    # uint8 order instead of the int32 original-coefficient planes and
    # skips the device argsort -- the upload+scores preamble was ~30% of
    # the zeroing wall at 2 MPix (NOTES.md).
    scores_h = candidate_scores_host(blocks_perm,
                                     np.asarray(orig_blocks)[perm],
                                     comp_mask, new_model)
    order0 = jnp.asarray(
        np.argsort(scores_h, axis=1, kind="stable").astype(np.uint8)) \
        .astype(jnp.int32)
    n_cand = jnp.asarray(
        np.isfinite(scores_h).sum(axis=1).astype(np.int32))

    state = (blocks_p.astype(jnp.int32), order0, n_cand,
             jnp.zeros((nb, K), jnp.int32),
             jnp.full((nb, K), jnp.inf, jnp.float32),
             jnp.int32(0))

    import time as _t

    from guetzli_tpu import config
    dbg = config.current().zeroing_debug
    if dbg:
        jax.block_until_ready(state[0])
        import sys as _sys
        _sys.stderr.write("zeroing: nb=%d upload+scores %.2fs\n"
                          % (nb, _t.time() - _t0_dbg))

    bank_idx = jnp.zeros((nb, K), jnp.int32)
    bank_err = jnp.full((nb, K), jnp.inf, jnp.float32)
    size = nb
    t_done = 0
    total = int(sorted_counts[0]) if nb else 0
    ladder = [s for s in _STAGE_SIZES if s < nb]
    while size > 0 and t_done < total:
        _ts_dbg = _t.time()
        # Run the current prefix until every block outside the next fixed
        # stage size is finished (its candidate count reached).
        nxt = ladder[0] if ladder else None
        max_t = int(sorted_counts[nxt]) if nxt is not None else total
        if max_t <= t_done:
            max_t = total
        state = _zeroing_stage(state, limit_p, aux_p, mode, comp_mask,
                               lookahead, early_exit,
                               max_t=jnp.int32(max_t))
        if dbg:
            jax.block_until_ready(state[0])
            import sys as _sys
            _sys.stderr.write(
                "zeroing: stage size=%d iters=%d->%d %.2fs\n"
                % (size, t_done, max_t, _t.time() - _ts_dbg))
        t_done = max_t
        if t_done >= total or nxt is None:
            break
        ladder = ladder[1:]
        # Blocks outside the fixed prefix are finished: bank their rows
        # on DEVICE (columns past t_done hold their init values, so full
        # rows are correct); nothing crosses the link here. The update
        # donates the bank so no fresh [NB, K] buffer is created (the
        # deployment's tunnel client leaks a host mirror per allocation).
        bank_idx = _bank_rows(bank_idx, state[3][nxt:size], nxt)
        bank_err = _bank_rows(bank_err, state[4][nxt:size], nxt)
        state = tuple(x[:nxt] for x in state[:5]) + (state[5],)
        aux_p = tuple(a[:nxt] for a in aux_p)
        if per_block_limit:
            limit_p = limit_p[:nxt]
        size = nxt

    bank_idx = _bank_rows(bank_idx, state[3][:size], 0)
    bank_err = _bank_rows(bank_err, state[4][:size], 0)
    return bank_idx, bank_err, perm, inv_perm, limit


def compute_zeroing_order_staged(blocks, orig_blocks, limit, aux, mode,
                                 comp_mask, lookahead=3, new_model=True,
                                 early_exit=False, put=None):
    """Staged-compaction driver for the greedy zeroing loop.

    Blocks finish after as many iterations as they have candidates; a
    single while_loop over all blocks would spend its long tail doing
    full-batch work for a handful of stragglers. Blocks are sorted by
    candidate count (host side, from the same validity rule the kernel
    uses); the loop runs the full batch only until every block outside the
    top-2048 is done, then continues on fixed-size prefixes (2048, 512):
    device work tracks the area under the sorted candidate-count curve
    instead of NB * max_count, with at most 3 device programs.

    Same results as the single-loop version, host-reassembled into the
    original block order. Returns (out_idx, out_err_monotonic, num).

    `limit` may be a scalar (single image) or an [NB] vector (per-block
    error limits -- blocks of several lockstep-batched images concatenated,
    each carrying its own image's limit; see NOTES.md lockstep design).

    `put` (optional) uploads host block arrays to the device; a mesh
    encode passes a sharded device_put (parallel/mesh.py) so the
    while_loop programs partition over the block axis.

    NOTE: production callers use compute_zeroing_csr_staged, which keeps
    the [NB, K] rails on device and pulls only the compacted CSR
    candidates (the tunnel's device->host path is the slow direction);
    this full-rail variant remains the reference/testing surface.
    """
    bank_idx, bank_err, _perm, inv_perm, limit = _staged_core(
        blocks, orig_blocks, limit, aux, mode, comp_mask, lookahead,
        new_model, early_exit, put)
    # Unpermute, monotonic suffix-min, cutoff (processor.cc:467-479).
    out_idx_np = np.asarray(bank_idx)[inv_perm]
    out_err_np = np.asarray(bank_err)[inv_perm]
    rev_min = np.minimum.accumulate(out_err_np[:, ::-1], axis=1)[:, ::-1]
    per_block_limit = limit.ndim == 1
    lim_col = limit[:, None] if per_block_limit else limit
    num = np.sum(rev_min <= lim_col, axis=1).astype(np.int32)
    return out_idx_np, rev_min, num


@partial(jax.jit, static_argnames=("scalar_limit",))
def _csr_counts_device(bank_err, limit_v, real_index, scalar_limit):
    """Per real block: suffix-min the banked errors, count entries at or
    below the limit (num) and the leading zero-error run (z). The CSR
    selection of csr_from_zeroing is exactly the slot range [z, num):
    the suffix-min is non-decreasing along slots, so `err <= limit` holds
    on a prefix and `err > 0` from some slot onward."""
    err_r = bank_err[real_index]                       # [NBR, K]
    rev = jax.lax.cummin(err_r[:, ::-1], axis=1)[:, ::-1]
    lim = limit_v if scalar_limit else limit_v[real_index][:, None]
    num = jnp.sum(rev <= lim, axis=1).astype(jnp.int32)
    z = jnp.sum(rev <= 0.0, axis=1).astype(jnp.int32)
    # One [2, NBR] array: a device_get of a 2-tuple costs ~2 tunnel
    # round trips (NOTES.md tunnel facts); packing halves the pull.
    return rev, jnp.stack([num, jnp.minimum(z, num)])


@jax.jit
def _csr_gather_device(rev, bank_idx, real_index, rows, cols):
    """Gather the selected (idx, err) pairs: rows/cols index the real-
    block-order rev matrix; idx comes from the banked (permuted) rails.
    Packed as one [2, M] f32 pull (idx values are < 192, exact in f32;
    see _csr_counts_device on why one array)."""
    idx_r = bank_idx[real_index]                       # [NBR, K]
    return jnp.stack([idx_r[rows, cols].astype(jnp.float32),
                      rev[rows, cols]])


@jax.jit
def _csr_gather_device_split(rev, bank_idx, real_index, rows, cols):
    """Large-M variant: idx as uint8 (values < 192) and err as f32 in
    two pulls -- 5 instead of 8 bytes per candidate over the ~13 MB/s
    device->host direction. The packed single-pull form wins at small M
    where the extra round trip dominates (a 2-array device_get is ~2
    RTTs)."""
    idx_r = bank_idx[real_index]
    return (idx_r[rows, cols].astype(jnp.uint8), rev[rows, cols])


def _argsort_rows_stable(scores):
    """Row-wise stable argsort of [NB, K] float32, permutation-identical
    to np.argsort(kind='stable').

    At multi-MPix sizes the single-threaded numpy mergesort is seconds
    of the fused preamble (host prep 8.5 s at 8 MPix incl. this,
    tpu_r05_large8d.log); torch's stable sort runs the rows on all host
    cores with the same by-value stability semantics (equality verified
    in tests/test_zeroing_fused.py::test_row_argsort_equivalence)."""
    if scores.shape[0] >= 16384:
        try:
            import torch
            return torch.from_numpy(scores).argsort(
                dim=1, stable=True).numpy()
        except ImportError:
            pass
    return np.argsort(scores, axis=1, kind="stable")


def _fused_wanted(mode, put, nb):
    """Whether the fused greedy-loop Pallas kernel drives this zeroing
    call (kernels/zeroing_loop.py). Auto: exactly where the fused lane
    compare kernel is already the production default (mode '444pl' =
    accelerator, no mesh); force with GUETZLI_TPU_ZEROING_FUSED=1
    (interpret-mode on CPU -- the parity-test path), disable with =0."""
    from guetzli_tpu import config
    f = config.current().zeroing_fused
    if f is False or nb == 0:
        return False
    if mode not in ("444pl", "444l", "444", "420yl", "420y",
                    "420cl", "420c"):
        return False          # matrix-aux modes keep the XLA loop
    if put is not None and put is not jnp.asarray:
        return False          # mesh-sharded encodes keep the GSPMD path
    if f is None:
        # Auto: accelerator only. 444 encodes signal it via the mode
        # ('444pl' = pallas auto on TPU); the 420 passes have no
        # pallas-switched mode name, so check the backend directly.
        if mode in ("420yl", "420y", "420cl", "420c"):
            if jax.default_backend() == "cpu":
                return False
        elif mode != "444pl":
            return False
    from guetzli_tpu.kernels import zeroing_loop
    return zeroing_loop.fused_available(_kmode(mode))


def _kmode(mode):
    if mode in ("420yl", "420y"):
        return "420y"
    if mode in ("420cl", "420c"):
        return "420c"
    return "444"


def _fused_core(blocks, orig_blocks, limit, aux, comp_mask, lookahead,
                new_model, early_exit, kmode="444"):
    """Fused-kernel twin of _staged_core: same host preamble (candidate
    counts, descending-count sort, host scores + initial order), then ONE
    pallas_call runs every block's whole greedy loop with per-tile trip
    counts (kernels/zeroing_loop.py) instead of the staged while_loop
    ladder. Returns (bank_idx_dev [NBp, K], bank_err_dev, perm, inv_perm,
    limit_np) -- rows past NB are tile padding (count 0, rails at their
    init values), which the shared CSR compaction never indexes."""
    import time as _t

    from guetzli_tpu import config
    from guetzli_tpu.kernels import zeroing_loop

    _t0_dbg = _t.time()
    nb = blocks.shape[0]
    limit = np.asarray(limit, dtype=np.float32)
    per_block_limit = limit.ndim == 1
    chan_ok = np.array([(comp_mask >> c) & 1 for c in range(3)], bool)
    valid = (np.asarray(blocks) != 0) & chan_ok[None, :, None]
    valid[:, :, 0] = False
    n_cand_host = valid.reshape(nb, K).sum(axis=1).astype(np.int64)
    perm = np.argsort(-n_cand_host, kind="stable")
    inv_perm = np.argsort(perm)

    tn = config.current().zeroing_tile_n
    nbp = -(-nb // tn) * tn

    blocks_perm = np.asarray(blocks)[perm]
    scores_h = candidate_scores_host(blocks_perm,
                                     np.asarray(orig_blocks)[perm],
                                     comp_mask, new_model)
    order0_h = _argsort_rows_stable(scores_h).astype(np.uint8)
    n_cand_p = np.zeros(nbp, np.int32)
    n_cand_p[:nb] = np.isfinite(scores_h).sum(axis=1).astype(np.int32)
    tile_bounds = n_cand_p[::tn].copy()    # desc-sorted: first = tile max

    def padb(a):
        if nbp == a.shape[0]:
            return a
        return np.concatenate(
            [a, np.zeros((nbp - a.shape[0],) + a.shape[1:], a.dtype)])

    # Host operands go into _fused_program as numpy: the jit call ships
    # them as one batched transfer instead of N separate jnp.asarray
    # uploads (each ~a round trip on the tunneled runtime). The order
    # ships as uint8 (values < 192) and widens on device.
    blocks_p = padb(blocks_perm)
    order0 = padb(order0_h)
    # Aux stays ON DEVICE: the permutation runs as a device gather inside
    # the fused program (perm_pad below). The staged path's
    # np.asarray(aux)[perm] pulls the [NB, 3, 64] opsin tiles over the
    # tunnel's ~13 MB/s device->host direction (~1.1 s at 1 MPix) only to
    # re-upload them permuted; with the r05 kernel at 0.1 s that pull WAS
    # the zeroing phase (tpu_r05_phase_fused_1m.log).
    aux_d = tuple(jnp.asarray(a) for a in aux)
    perm_pad = np.zeros(nbp, np.int32)
    perm_pad[:nb] = perm            # padding rows gather row 0: their
    # content is irrelevant (count 0 -> never active, rails dropped by
    # real_index) and lanes are elementwise-isolated.
    lim_p = np.zeros(nbp, np.float32)
    lim_p[:nb] = limit[perm] if per_block_limit else limit

    dbg = config.current().zeroing_debug
    if dbg:
        import sys as _sys
        _sys.stderr.write("zeroing-fused: nb=%d (pad %d) host prep "
                          "%.2fs\n" % (nb, nbp, _t.time() - _t0_dbg))
        _tk_dbg = _t.time()

    interpret = jax.default_backend() == "cpu"
    bank_idx, bank_err = _fused_program(
        blocks_p, order0, n_cand_p, aux_d, perm_pad, lim_p,
        tile_bounds.astype(np.int32), lookahead, early_exit, interpret,
        kmode)
    if dbg:
        jax.block_until_ready(bank_err)
        import sys as _sys
        _sys.stderr.write("zeroing-fused: kernel (%d tiles, max_t %d) "
                          "%.2fs\n" % (len(tile_bounds),
                                       int(tile_bounds.max(initial=0)),
                                       _t.time() - _tk_dbg))
    return bank_idx, bank_err, perm, inv_perm, limit


@partial(jax.jit, static_argnames=("lookahead", "early_exit",
                                   "interpret", "kmode"))
def _fused_program(blocks_p, order0, n_cand, aux_d, perm_pad, lim_p,
                   tile_bounds, lookahead, early_exit, interpret,
                   kmode="444"):
    """Device program around the greedy-loop kernel: permute+pad the aux
    by a device gather, transpose the operands to lane-major once, run
    the kernel, transpose the rails back to the [NBp, K] banking
    layout. kmode '420y' carries the frozen chroma bytes as aux_d[0]."""
    from guetzli_tpu.kernels import zeroing_loop
    from guetzli_tpu.ops import tiles_lanes as tl
    nbp = blocks_p.shape[0]
    coeffs_t = jnp.transpose(blocks_p.reshape(nbp, K).astype(jnp.int32))
    order_t = jnp.transpose(order0.astype(jnp.int32))
    aux_p = tuple(a[perm_pad] for a in aux_d)
    chroma_t = None
    aux420c = None
    if kmode == "420y":
        chroma_t = jnp.transpose(aux_p[0].astype(jnp.int32),
                                 (1, 2, 3, 0))
        aux_p = aux_p[1:]
    if kmode == "420c":
        # (neigh_u, neigh_v, y16, xyb0_sub, scales_sub, ysel_sub,
        #  xsel_sub, valid) -> the kernel's lane-minor layouts
        # (_eval_lanes_420c; sub-blocks as leading dims).
        nu, nv, y16, x0s, scs, ysub, xsub, val = aux_p
        aux420c = (
            jnp.transpose(nu.astype(jnp.int32), (1, 2, 0)),
            jnp.transpose(nv.astype(jnp.int32), (1, 2, 0)),
            jnp.transpose(y16.astype(jnp.int32), (1, 2, 0)),
            jnp.transpose(x0s.reshape(nbp, 2, 2, 3, 8, 8),
                          (1, 2, 3, 4, 5, 0)),
            jnp.transpose(scs, (1, 2, 3, 0)),
            jnp.transpose(ysub[..., 7].astype(jnp.int32), (1, 2, 0)),
            jnp.transpose(xsub[..., 7].astype(jnp.int32), (1, 2, 0)),
            jnp.transpose(val.astype(jnp.int32), (1, 2, 0)),
        )
        # The generic 444 aux operands become small dummies (the kernel
        # loads but never uses them in this mode).
        x0 = jnp.zeros((3, 8, 8, nbp), jnp.float32)
        sc = jnp.ones((3, nbp), jnp.float32)
        ymax = xmax = jnp.full((nbp,), 7, jnp.int32)
    else:
        x0, sc, ymax, xmax = tl.transpose_aux_444(*aux_p)
    out_idx_t, out_err_t = zeroing_loop.zeroing_loop_lanes(
        coeffs_t, order_t, n_cand[None, :], x0, sc, ymax[None, :],
        xmax[None, :], lim_p[None, :], tile_bounds,
        lookahead=lookahead, early_exit=early_exit, interpret=interpret,
        mode=kmode, chroma_t=chroma_t, aux420c=aux420c)
    return jnp.transpose(out_idx_t), jnp.transpose(out_err_t)


def compute_zeroing_csr_staged(blocks, orig_blocks, limit, aux, mode,
                               comp_mask, real_index=None, lookahead=3,
                               new_model=True, early_exit=False,
                               put=None):
    """Staged zeroing + DEVICE-side CSR compaction.

    Returns (offsets [NBR+1] int64, cand_idx [M] int32, cand_err [M]
    float32) -- bit-identical to csr_from_zeroing(compute_zeroing_order_
    staged(...)) but pulling only the selected candidates over the
    device link: counts [NBR] first (chooses the padded gather size),
    then the M selected (idx, err) pairs. The [NB, K] rails never leave
    the device -- at production sizes they are 10-100x the CSR's bytes,
    and device->host is the tunnel's slow direction (~13 MB/s measured,
    tpu_r04_zeroing_ab.json bandwidth rows).

    real_index: optional [NBR] int32 mapping output row -> row of the
    (padded) input block axis (identity when None); the caller uses it
    to drop bucket-padding rows and to split lockstep-concatenated
    corpora without pulling padded rows.

    On accelerators in 444 mode the greedy loop runs inside ONE fused
    Pallas kernel (kernels/zeroing_loop.py, see _fused_wanted); the
    staged while_loop ladder remains the fallback and the mesh/420/CPU
    path. Both produce bit-identical rails, so the CSR below is
    path-independent (tests/test_zeroing_fused.py).
    """
    if _fused_wanted(mode, put, blocks.shape[0]):
        bank_idx, bank_err, perm, inv_perm, limit_np = _fused_core(
            blocks, orig_blocks, limit, aux, comp_mask, lookahead,
            new_model, early_exit, _kmode(mode))
    else:
        bank_idx, bank_err, perm, inv_perm, limit_np = _staged_core(
            blocks, orig_blocks, limit, aux, mode, comp_mask, lookahead,
            new_model, early_exit, put)
    # Real (unpadded) block count: the fused core's bank carries extra
    # lane-tile padding rows that inv_perm/real_index never select.
    nb = blocks.shape[0]
    if real_index is None:
        real_index = np.arange(nb, dtype=np.int64)
    # Output row r lives at permuted row inv_perm[real_index[r]].
    lookup = jnp.asarray(inv_perm[np.asarray(real_index)].astype(np.int32))
    scalar_limit = limit_np.ndim == 0
    limit_v = (jnp.float32(limit_np) if scalar_limit
               else jnp.asarray(limit_np[perm]))
    from guetzli_tpu import config as _config_mod
    dbg = _config_mod.current().zeroing_debug
    if dbg:
        import sys
        import time as _t
        jax.block_until_ready(bank_err)
        _t0 = _t.time()
    rev, nz_d = _csr_counts_device(bank_err, limit_v, lookup,
                                   scalar_limit)
    nz = np.asarray(nz_d)
    num, z = nz[0], nz[1]
    if dbg:
        sys.stderr.write("zeroing-csr: counts pull %.2fs\n"
                         % (_t.time() - _t0))
        _t0 = _t.time()
    counts = (num - z).astype(np.int64)
    nbr = len(counts)
    offsets = np.zeros(nbr + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    m = int(offsets[-1])
    if m == 0:
        return (offsets, np.empty(0, np.int32), np.empty(0, np.float32))
    # Pad the gather to a shape bucket so the program compiles once per
    # bucket, not per candidate count.
    mp = 512
    while mp < m:
        mp *= 2
    rows = np.zeros(mp, dtype=np.int32)
    cols = np.zeros(mp, dtype=np.int32)
    rows[:m] = np.repeat(np.arange(nbr, dtype=np.int32), counts)
    within = (np.arange(m, dtype=np.int64)
              - np.repeat(offsets[:-1], counts))
    cols[:m] = (np.repeat(z, counts) + within).astype(np.int32)
    if dbg:
        sys.stderr.write("zeroing-csr: host build m=%d mp=%d %.2fs\n"
                         % (m, mp, _t.time() - _t0))
        _t0 = _t.time()
    if mp >= (1 << 20):
        idx_d, err_d = _csr_gather_device_split(
            rev, bank_idx, lookup, jnp.asarray(rows), jnp.asarray(cols))
        idx_np, err_np = jax.device_get((idx_d, err_d))
        out = (offsets, np.asarray(idx_np[:m]).astype(np.int32),
               np.asarray(err_np[:m], np.float32))
    else:
        packed = np.asarray(_csr_gather_device(
            rev, bank_idx, lookup, jnp.asarray(rows), jnp.asarray(cols)))
        out = (offsets, packed[0, :m].astype(np.int32),
               np.asarray(packed[1, :m], np.float32))
    if dbg:
        sys.stderr.write("zeroing-csr: gather pull %.2fs\n"
                         % (_t.time() - _t0))
    return out


@partial(jax.jit, static_argnames=("mode", "comp_mask", "lookahead",
                                   "new_model", "early_exit"))
def compute_zeroing_order_with(blocks, orig_blocks, limit, aux, mode,
                               comp_mask, lookahead=3, new_model=True,
                               early_exit=False):
    """Greedy zeroing order for all blocks simultaneously.

    Args:
      blocks:      [NB, 3, 64] int32 current dequantized coefficients.
      orig_blocks: [NB, 3, 64] int32 original dequantized coefficients.
      limit:       comparator block error limit (target distance).
      aux:         tuple of device arrays with the pass's frozen state (see
        _eval_dispatch); passed as arguments so recompilation only depends
        on geometry, not values.
      mode:        static evaluator selector: '444', '420y', '420c'.
      comp_mask:   channel bitmask (7 for YUV444, 1 for Y, 6 for UV).
      early_exit:  stop a block once its best error reaches the limit (the
        reference `--c` fast path, processor.cc:458-465); the default full
        semantics match MODE_CPU.
    Returns:
      out_idx [NB, K] int32 (c*64+k of each zeroed coefficient, in order),
      out_err [NB, K] float32 monotonic block errors,
      num     [NB] int32 entries below the error limit (candidate counts).
    """
    nb = blocks.shape[0]
    aux_rep = _rep_aux(aux, lookahead, mode)

    def eval_batch(cand):
        return _eval_dispatch(mode, cand, aux_rep, lookahead)
    scores = candidate_scores(blocks, orig_blocks, comp_mask, new_model)
    order0 = jnp.argsort(scores, axis=1).astype(jnp.int32)     # [NB, K]
    n_cand = jnp.sum(jnp.isfinite(scores), axis=1).astype(jnp.int32)

    def body(state):
        processed, order, n_remaining, out_idx, out_err, t = state
        active = n_remaining > 0
        flat = processed.reshape(nb, K)

        # Evaluate zeroing each of the next `lookahead` candidates.
        idxs = order[:, :lookahead]                            # [NB, L]
        cand = (flat[:, None, :]
                * (1 - jax.nn.one_hot(idxs, K, dtype=jnp.int32)))
        cand = cand.reshape(nb * lookahead, 3, 64)
        errs = eval_batch(cand).reshape(nb, lookahead)
        l_valid = jnp.arange(lookahead)[None, :] < n_remaining[:, None]
        errs = jnp.where(l_valid, errs, jnp.inf)

        best_l = jnp.argmin(errs, axis=1).astype(jnp.int32)    # [NB]
        best_err = jnp.min(errs, axis=1)
        # Gather-free picks/shifts (see _zeroing_stage).
        best_idx = jnp.sum(
            jnp.where(jnp.arange(lookahead,
                                 dtype=jnp.int32)[None, :] == best_l[:,
                                                                     None],
                      idxs, 0), axis=1)

        zero_mask = jax.nn.one_hot(best_idx, K, dtype=jnp.int32)
        new_flat = jnp.where(active[:, None], flat * (1 - zero_mask), flat)

        # Remove position best_l by shifting the tail left.
        j = jnp.arange(K, dtype=jnp.int32)[None, :]
        shifted = jnp.concatenate([order[:, 1:], order[:, -1:]], axis=1)
        new_order = jnp.where(active[:, None] & (j >= best_l[:, None]),
                              shifted, order)

        out_idx = out_idx.at[:, t].set(jnp.where(active, best_idx, 0))
        out_err = out_err.at[:, t].set(jnp.where(active, best_err, jnp.inf))

        if early_exit:
            stop = active & (best_err >= limit)
        else:
            stop = jnp.zeros_like(active)
        new_remaining = jnp.where(stop, 0,
                                  n_remaining - active.astype(jnp.int32))
        return (new_flat.reshape(nb, 3, 64), new_order, new_remaining,
                out_idx, out_err, t + 1)

    def cond(state):
        _, _, n_remaining, _, _, t = state
        return jnp.logical_and(jnp.any(n_remaining > 0), t < K)

    init = (blocks.astype(jnp.int32), order0, n_cand,
            jnp.zeros((nb, K), jnp.int32),
            jnp.full((nb, K), jnp.inf, jnp.float32),
            jnp.int32(0))
    _, _, _, out_idx, out_err, _ = jax.lax.while_loop(cond, body, init)

    # Monotonic pass: suffix min (processor.cc:467-472), then cutoff at the
    # block error limit (:473-479). The suffix-min is non-decreasing, so the
    # entries at or below the limit form a prefix. `limit` may be a scalar
    # or an [NB] per-block vector (lockstep-batched images).
    rev_min = jax.lax.cummin(out_err[:, ::-1], axis=1)[:, ::-1]
    lim_col = limit if jnp.ndim(limit) == 0 else limit[:, None]
    num = jnp.sum(rev_min <= lim_col, axis=1).astype(jnp.int32)
    return out_idx, rev_min, num
