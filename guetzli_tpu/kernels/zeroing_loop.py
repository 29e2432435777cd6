"""Fused greedy zeroing loop: the ENTIRE per-block greedy search runs
inside one Pallas TPU kernel.

The reference runs the whole greedy loop in-kernel -- one GPU work-item
per macroblock iterates remove-candidate / evaluate / commit privately
(clComputeBlockZeroingOrderEx, clguetzli.cl:752-879). Round 4 fused only
the inner block-compare (kernels/tile_compare_lanes.py) and left the
greedy shell to an XLA `lax.while_loop`; the shell's bookkeeping (one-hot
candidate build, candidate transpose, order shift, output column updates
-- all [NB, 192]-sized HBM traffic plus per-iteration launch overhead)
measured ~6x the eval itself at 1 MPix scale (VERDICT r04 item 1,
~50 ms/iter production vs ~7 ms standalone eval).

This kernel is the reference's design mapped to the TPU memory
hierarchy:

  * grid over lane tiles of TN blocks (blocks in lanes, the proven
    Mosaic layout of tile_compare_lanes.py);
  * per grid step, the block state (coefficients [192, TN], candidate
    order [192, TN], remaining counts [1, TN]) is copied once into VMEM
    scratch and mutated there across a `fori_loop` -- zero HBM traffic
    per greedy iteration;
  * the candidate evaluation is the IDENTICAL lane-major jnp chain the
    XLA path uses (ops/tiles_lanes.py), so per-lane results are
    bit-equal to the staged path and the lockstep byte-identity
    contract is preserved;
  * per-tile trip counts: blocks arrive sorted by candidate count
    (descending, zeroing._staged_core's ordering), so each tile's
    required iteration count is its first lane's count. The counts ride
    in as a scalar-prefetch operand and each grid step loops only to
    its own bound -- device work tracks the area under the sorted
    candidate-count curve at TILE granularity, replacing the 3-stage
    compaction ladder (and its program-size cliff past ~123k tiles:
    grid steps scale linearly, so batch-32 lockstep no longer falls off
    the r04 batch-width curve).

Outputs are the [192, N] zeroed-index / block-error rails in the same
encoding the staged path banks; the CSR compaction on top is shared
(search/zeroing.py).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from guetzli_tpu import config as _config
from guetzli_tpu.ops import tiles_lanes as tl

K = 192  # 3 * 64 candidate slots per block


def _finish_lanes_k(rgb, x0, sc, csfd):
    """Shared compare tail (sRGB bytes -> weighted error [1, TN]); the
    in-kernel twin of tiles_lanes._finish_lanes with the CSF table as an
    operand."""
    lin = tl._srgb_to_linear_lanes(rgb)
    xyb1 = tl.opsin_blocks_lanes(lin)
    m0, m1 = tl.mhic_lanes(x0, xyb1)
    dc, ac, edge = tl.block_diff_lanes(m0, m1, csfd)
    diff = jnp.sum((dc + ac) * sc, axis=0, keepdims=True)
    diff_edge = jnp.sum(edge * sc, axis=0, keepdims=True)
    w = np.float32(tl._BLOCK_EDGE_W)
    return jnp.sqrt((1.0 - w) * diff + w * diff_edge)


def _eval_lanes(cand, x0, sc, ymax, xmax, csfd, chroma=None):
    """One lane-major block compare: [3, 8, 8, TN] int32 candidates ->
    [1, TN] float32 errors. Same op sequence as tile_compare_lanes._kernel
    (itself the ops/tiles_lanes.py chain), so per-lane numerics match the
    XLA '444l'/'444pl' paths bit-for-bit. With `chroma` ([2, 8, 8, TN]
    frozen bytes) the candidate's Y channel is evaluated against the
    frozen chroma -- the 420 Y-pass (compare_blocks_lanes420y twin)."""
    if chroma is not None:
        yv = tl.idct_lanes(cand[0])
        yv = tl.edge_replicate_lanes(yv, ymax, xmax)
        rgb = tl._ycbcr_to_rgb_lanes(yv, chroma[0], chroma[1])
    else:
        v = tl.idct_lanes(cand)
        v = tl.edge_replicate_lanes(v, ymax, xmax)
        rgb = tl._ycbcr_to_rgb_lanes(v[0], v[1], v[2])
    return _finish_lanes_k(rgb, x0, sc, csfd)


def _dith16():
    """ToPixels dither 8 - (x & 1) over the 16-wide axis, built from an
    in-kernel iota (pallas kernels may not capture array constants)."""
    x = jax.lax.broadcasted_iota(jnp.int32, (1, 16, 1), 1)
    return 8 - (x & 1)


def _eval_lanes_420c(cand, nu, nv, y16, x0c, scc, ymaxc, xmaxc,
                     validc, csfd):
    """420 chroma-pass macroblock compare (compare_blocks_lanes420c
    twin), sub-blocks as LEADING dims instead of folded into lanes (a
    lane-axis reshape merging leading dims is the one layout Mosaic is
    likely to reject).

    cand: [3, 8, 8, TN] (channels 1/2 hold the chroma candidates);
    nu/nv: [10, 10, TN] frozen x16 subsampled planes; y16: [16, 16, TN]
    frozen Y bytes; x0c: [2, 2, 3, 8, 8, TN]; scc: [2, 2, 3, TN];
    ymaxc/xmaxc/validc: [2, 2, TN]. Returns [1, TN] max sub-block error.
    """
    def chroma16(c8, neigh):
        v = tl.idct_lanes(c8)
        # neigh[1:9, 1:9] = v << 4, without .at[].set (Mosaic has no
        # scatter): pad v to the 10x10 frame and select the interior by
        # iota masks.
        padded = jnp.pad(v << 4, ((1, 1), (1, 1), (0, 0)))
        ry = jax.lax.broadcasted_iota(jnp.int32, (10, 1, 1), 0)
        cx = jax.lax.broadcasted_iota(jnp.int32, (1, 10, 1), 1)
        inner = (ry >= 1) & (ry <= 8) & (cx >= 1) & (cx <= 8)
        filled = jnp.where(inner, padded, neigh)
        return tl.upsample_16x16_lanes(filled)

    u16 = chroma16(cand[1], nu)
    v16 = chroma16(cand[2], nv)
    dith = _dith16()
    ub = (u16 + dith) >> 4
    vb = (v16 + dith) >> 4

    best = None
    for sy in range(2):
        for sx in range(2):
            ysl = slice(sy * 8, sy * 8 + 8)
            xsl = slice(sx * 8, sx * 8 + 8)
            rep = lambda p: tl.edge_replicate_lanes(   # noqa: E731
                p[ysl, xsl, :], ymaxc[sy, sx], xmaxc[sy, sx])
            rgb = tl._ycbcr_to_rgb_lanes(rep(y16), rep(ub), rep(vb))
            err = _finish_lanes_k(rgb, x0c[sy, sx], scc[sy, sx], csfd)
            err = jnp.where(validc[sy:sy + 1, sx] > 0, err, 0.0)
            best = err if best is None else jnp.maximum(best, err)
    return best


def _shift_up(order, rows):
    """shifted[j] = order[j + 1] for j < K-1, shifted[K-1] = order[K-1]:
    the order-list left shift, formulated as a roll + last-row fix (the
    same jnp.roll class mhic_lanes already lowers through Mosaic)."""
    return jnp.where(rows == K - 1, order, jnp.roll(order, -1, axis=0))


def _greedy_kernel(tb_ref, coeffs_ref, order_ref, nrem_ref, x0_ref,
                   sc_ref, ymax_ref, xmax_ref, lim_ref, csfd_ref,
                   *rest, lookahead, early_exit, mode):
    chroma = aux420c = None
    if mode == "420y":
        (chroma_ref, outidx_ref, outerr_ref,
         coeffs_s, order_s, nrem_s) = rest
        chroma = chroma_ref[...]
    elif mode == "420c":
        (nu_ref, nv_ref, y16_ref, x0c_ref, scc_ref, ymaxc_ref,
         xmaxc_ref, validc_ref, outidx_ref, outerr_ref,
         coeffs_s, order_s, nrem_s) = rest
        aux420c = (nu_ref[...], nv_ref[...], y16_ref[...], x0c_ref[...],
                   scc_ref[...], ymaxc_ref[...], xmaxc_ref[...],
                   validc_ref[...])
    else:
        outidx_ref, outerr_ref, coeffs_s, order_s, nrem_s = rest
    i = pl.program_id(0)
    t_hi = tb_ref[i]

    # Block state into VMEM scratch (mutated across the greedy loop).
    coeffs_s[...] = coeffs_ref[...]
    order_s[...] = order_ref[...]
    nrem_s[...] = nrem_ref[...]
    outidx_ref[...] = jnp.zeros_like(outidx_ref)
    outerr_ref[...] = jnp.full_like(outerr_ref, jnp.inf)

    x0 = x0_ref[...]                             # [3, 8, 8, TN]
    sc = sc_ref[...]                             # [3, TN]
    ymax = ymax_ref[...][0]                      # [TN]
    xmax = xmax_ref[...][0]
    lim = lim_ref[...]                           # [1, TN]
    csfd = csfd_ref[...][..., None]              # [8, 8, 1]
    tn = coeffs_ref.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)

    def body(t, _):
        coeffs = coeffs_s[...]                   # [K, TN] int32
        order = order_s[...]                     # [K, TN] int32
        nrem = nrem_s[...]                       # [1, TN] int32
        active = nrem > 0

        best_err = best_l = best_idx = None
        for l in range(lookahead):
            idx_l = order[l:l + 1, :]            # [1, TN]
            cand = jnp.where(rows == idx_l, 0, coeffs)
            if aux420c is not None:
                errs_l = _eval_lanes_420c(cand.reshape(3, 8, 8, tn),
                                          *aux420c, csfd)
            else:
                errs_l = _eval_lanes(cand.reshape(3, 8, 8, tn),
                                     x0, sc, ymax, xmax, csfd, chroma)
            errs_l = jnp.where(nrem > l, errs_l, jnp.inf)
            if l == 0:
                best_err = errs_l
                best_l = jnp.zeros_like(nrem)
                best_idx = idx_l
            else:
                upd = errs_l < best_err          # strict: argmin ties
                best_err = jnp.where(upd, errs_l, best_err)
                best_l = jnp.where(upd, l, best_l)
                best_idx = jnp.where(upd, idx_l, best_idx)

        coeffs_s[...] = jnp.where(active & (rows == best_idx), 0, coeffs)
        order_s[...] = jnp.where(active & (rows >= best_l),
                                 _shift_up(order, rows), order)
        sel = (rows == t) & active
        outidx_ref[...] = jnp.where(sel, best_idx, outidx_ref[...])
        outerr_ref[...] = jnp.where(sel, best_err, outerr_ref[...])
        if early_exit:
            stop = active & (best_err >= lim)
            nrem_s[...] = jnp.where(stop, 0,
                                    nrem - active.astype(jnp.int32))
        else:
            nrem_s[...] = nrem - active.astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, t_hi, body, 0)


@partial(jax.jit, static_argnames=("lookahead", "early_exit", "interpret",
                                   "mode"))
def zeroing_loop_lanes(coeffs_t, order_t, nrem, x0, sc, ymax2, xmax2,
                       lim2, tile_bounds, lookahead=3, early_exit=False,
                       interpret=False, mode="444", chroma_t=None,
                       aux420c=None):
    """Run the whole greedy zeroing loop on lane-major state.

    Args:
      coeffs_t: [K, N] int32 dequantized coefficients, blocks in lanes
        (row c*64+k), N a multiple of the lane tile.
      order_t: [K, N] int32 score-sorted candidate order.
      nrem: [1, N] int32 per-block candidate counts.
      x0: [3, 8, 8, N] f32 original opsin tiles; sc: [3, N] f32 scales;
      ymax2, xmax2: [1, N] int32 edge-replication clamp maxima;
      lim2: [1, N] f32 per-block error limits (early_exit only);
      tile_bounds: [N // TN] int32 per-tile iteration bounds (max
        candidate count within the tile; blocks sorted descending).
      mode: "444" or "420y" (the latter takes chroma_t [2, 8, 8, N]
        frozen chroma bytes and evaluates only the candidate Y channel).
    Returns (out_idx [K, N] int32, out_err [K, N] f32): row t of block b
    holds the t-th zeroed slot and its block error (inf/0 past the
    block's count) -- the transpose of the staged path's banked rails.
    """
    n = coeffs_t.shape[-1]
    tn = _config.current().zeroing_tile_n
    assert n % tn == 0, (n, tn)
    grid = (n // tn,)
    vmem_mb = _config.current().pallas_vmem_mb
    lane_spec = lambda r: pl.BlockSpec(  # noqa: E731
        (r, tn), lambda i, *_: (0, i), memory_space=pltpu.VMEM)
    in_specs = [
        lane_spec(K),                               # coeffs
        lane_spec(K),                               # order
        lane_spec(1),                               # nrem
        pl.BlockSpec((3, 8, 8, tn), lambda i, *_: (0, 0, 0, i),
                     memory_space=pltpu.VMEM),      # x0
        pl.BlockSpec((3, tn), lambda i, *_: (0, i),
                     memory_space=pltpu.VMEM),      # sc
        lane_spec(1),                               # ymax
        lane_spec(1),                               # xmax
        lane_spec(1),                               # lim
        pl.BlockSpec((8, 8), lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM),      # csfd
    ]
    operands = [tile_bounds, coeffs_t, order_t, nrem, x0, sc, ymax2,
                xmax2, lim2, jnp.asarray(tl._CSF_D[..., 0])]
    if mode == "420y":
        in_specs.append(
            pl.BlockSpec((2, 8, 8, tn), lambda i, *_: (0, 0, 0, i),
                         memory_space=pltpu.VMEM))  # frozen chroma
        operands.append(chroma_t)
    elif mode == "420c":
        # (nu, nv, y16, x0c, scc, ymaxc, xmaxc, validc) -- see
        # _eval_lanes_420c for shapes; lane axis minor throughout.
        shapes = [(10, 10, tn), (10, 10, tn), (16, 16, tn),
                  (2, 2, 3, 8, 8, tn), (2, 2, 3, tn), (2, 2, tn),
                  (2, 2, tn), (2, 2, tn)]
        for shp in shapes:
            nl = len(shp) - 1
            in_specs.append(pl.BlockSpec(
                shp, (lambda nl: lambda i, *_: (0,) * nl + (i,))(nl),
                memory_space=pltpu.VMEM))
        operands.extend(aux420c)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=[lane_spec(K), lane_spec(K)],
        scratch_shapes=[
            pltpu.VMEM((K, tn), jnp.int32),             # coeffs
            pltpu.VMEM((K, tn), jnp.int32),             # order
            pltpu.VMEM((1, tn), jnp.int32),             # nrem
        ],
    )
    out_idx, out_err = pl.pallas_call(
        partial(_greedy_kernel, lookahead=lookahead,
                early_exit=early_exit, mode=mode),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((K, n), jnp.int32),
                   jax.ShapeDtypeStruct((K, n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb << 20),
        interpret=interpret,
    )(*operands)
    return out_idx, out_err


_FUSED_OK = {}


def fused_available(mode="444"):
    """One-time probe per mode: compile+run the greedy-loop kernel on one
    dummy tile so a Mosaic lowering failure degrades to the staged XLA
    path with a warning instead of crashing mid-encode (same contract as
    tile_compare_lanes.mosaic_available)."""
    if mode not in _FUSED_OK:
        try:
            tn = _config.current().zeroing_tile_n
            z32 = jnp.zeros((K, tn), jnp.int32)
            chroma = (jnp.full((2, 8, 8, tn), 128, jnp.int32)
                      if mode == "420y" else None)
            aux420c = None
            if mode == "420c":
                aux420c = (
                    jnp.zeros((10, 10, tn), jnp.int32),
                    jnp.zeros((10, 10, tn), jnp.int32),
                    jnp.full((16, 16, tn), 128, jnp.int32),
                    jnp.zeros((2, 2, 3, 8, 8, tn), jnp.float32),
                    jnp.ones((2, 2, 3, tn), jnp.float32),
                    jnp.full((2, 2, tn), 7, jnp.int32),
                    jnp.full((2, 2, tn), 7, jnp.int32),
                    jnp.ones((2, 2, tn), jnp.int32),
                )
            out = zeroing_loop_lanes(
                z32, z32, jnp.ones((1, tn), jnp.int32),
                jnp.zeros((3, 8, 8, tn), jnp.float32),
                jnp.ones((3, tn), jnp.float32),
                jnp.full((1, tn), 7, jnp.int32),
                jnp.full((1, tn), 7, jnp.int32),
                jnp.ones((1, tn), jnp.float32),
                jnp.ones((1,), jnp.int32),
                interpret=jax.default_backend() == "cpu",
                mode=mode, chroma_t=chroma, aux420c=aux420c)
            jax.block_until_ready(out)
            _FUSED_OK[mode] = True
        except Exception as e:                      # noqa: BLE001
            import sys
            sys.stderr.write(
                "Fused zeroing-loop kernel (%s) unavailable on this "
                "backend (%s); falling back to the staged zeroing path\n"
                % (mode, str(e).splitlines()[0][:200]))
            _FUSED_OK[mode] = False
    return _FUSED_OK[mode]
