"""Lane-major (tiles-last) variant of the per-block compare pipeline.

The standard tile path (ops/tiles.py) batches [N, 3, 8, 8] tiles: on TPU
the minor (8, 8) dims map to (sublanes, lanes), so each vector tile holds
8 of 128 lanes -- 16x wasted vector work and memory for every elementwise
op in the chain. Here the SAME math runs on [3, 8, 8, N] arrays (blocks in
lanes, like the reference GPU kernel's one-work-item-per-block SIMD,
clguetzli.cl:752-879): every elementwise op is fully lane-utilized and the
8-point contractions (IDCT, opsin blur, DFT) become small dot_generals
with N as the free minor dimension.

Numerics: same operation sequence as ops/tiles.py up to reduction
reassociation and the closed-form LUT reads (ops/image.srgb_to_linear
default, blockdiff color_diff_*), i.e. ~1e-6-relative drift -- inside the
encoder's validation band (tests assert size within 2% + distance at
target; see tests/test_tiles_lanes.py for the direct cross-check).

Used by the zeroing greedy loop (search/zeroing.py mode '444l') where the
candidate evaluation is the hot device program; enabled by default, opt
out with GUETZLI_TPU_LANES=0.
"""

import jax
import jax.numpy as jnp
import numpy as np

from guetzli_tpu import consts
from guetzli_tpu.ops import blockdiff as bd
from guetzli_tpu.ops.blur import blur_matrix
from guetzli_tpu.ops.opsin import gamma

_HI = jax.lax.Precision.HIGHEST
_IDCT = consts.IDCT_MATRIX.astype(np.int32)
_BLOCK_EDGE_W = np.float32(consts.BLOCK_EDGE_WEIGHT)


def _mat_axis(mat, x, axis, np_dtype, dot=False):
    """out[..., i, ...] = sum_j mat[i, j] * x[..., j, ...] contracting
    `axis` of x as unrolled fixed-order FMAs on [..., N] slices.

    The unrolled form rounds identically per lane at every batch size on
    every backend -- required by the lockstep-corpus == serial
    byte-identity contract -- and it is the only form Mosaic lowers
    inside the production Pallas kernels (the dot form fails with a
    constant-capture error, tpu_r05_dot_fused_1m.json). `dot=True`
    switches to ONE dot_general: used by the WHOLE-IMAGE block diff on
    accelerators (ops/diffmap.block_diff_map_dyn), where the unrolled
    form costs ~64 HBM passes per contraction at ~900k lanes and the
    MXU accumulation order per output element is batch-invariant (same
    backend-conditional reasoning as blockdiff.fft8x8_squared)."""
    m = np.asarray(mat, dtype=np_dtype)
    if dot and np_dtype == np.float32:
        ax = axis if axis >= 0 else x.ndim + axis
        out = jax.lax.dot_general(
            x.astype(jnp.float32), jnp.asarray(m),
            dimension_numbers=(((ax,), (1,)), ((), ())),
            precision=_HI)
        return jnp.moveaxis(out, -1, ax)
    xs = [jax.lax.index_in_dim(x, j, axis, keepdims=False)
          for j in range(8)]
    if np_dtype == np.float32:
        xs = [v.astype(jnp.float32) for v in xs]
    parts = []
    for i in range(8):
        acc = m[i][0] * xs[0]
        for j in range(1, 8):
            acc = acc + m[i][j] * xs[j]
        parts.append(acc)
    return jnp.stack(parts, axis=axis if axis >= 0 else x.ndim + axis)


def _np_dtype(x, dtype):
    if dtype is not None:
        return np.int32 if dtype == jnp.int32 else np.float32
    return np.int32 if x.dtype == jnp.int32 else np.float32


def _mat_y(mat, x, dtype=None, dot=False):
    """Contract the -3rd (y-like) axis of [..., 8, 8, N]."""
    return _mat_axis(mat, x, -3, _np_dtype(x, dtype), dot)


def _mat_x(mat, x, dtype=None, dot=False):
    """Contract the -2nd (x-like) axis of [..., 8, 8, N]."""
    return _mat_axis(mat, x, -2, _np_dtype(x, dtype), dot)


def idct_lanes(c):
    """Integer IDCT of [..., 8(u), 8(x), N] int32 coefficient tiles
    (ComputeBlockIDCT, idct.cc:139-161), tiles-last."""
    col = _mat_y(_IDCT, c.astype(jnp.int32))
    col = (col + (1 << 10)) >> 11
    row = _mat_x(_IDCT, col)
    row = (row + (257 << 17)) >> 18
    return jnp.clip(row, 0, 255)


def edge_replicate_lanes(v, ymax, xmax):
    """ToPixels right/bottom edge replication (output_image.cc:86-97) on
    [..., 8, 8, N] tiles with per-tile clamp maxima [N]."""
    f = v
    # Row replication: rows past ymax copy row ymax.
    rows = [f[..., i, :, :] for i in range(8)]
    edge_row = rows[0] * (ymax == 0)
    for i in range(1, 8):
        edge_row = edge_row + rows[i] * (ymax == i)
    out_rows = [jnp.where(ymax >= i, rows[i], edge_row) for i in range(8)]
    f = jnp.stack(out_rows, axis=-3)
    cols = [f[..., :, i, :] for i in range(8)]
    edge_col = cols[0] * (xmax == 0)
    for i in range(1, 8):
        edge_col = edge_col + cols[i] * (xmax == i)
    out_cols = [jnp.where(xmax >= i, cols[i], edge_col) for i in range(8)]
    return jnp.stack(out_cols, axis=-2)


def _srgb_to_linear_lanes(v):
    """Arithmetic form of the 256-entry LUT (gamma_correct.cc:23-33);
    axis-agnostic (same form as ops/image.srgb_to_linear default)."""
    vf = v.astype(jnp.float32)
    lo = vf * np.float32(1.0 / 12.92)
    hi = np.float32(255.0) * (
        (vf * np.float32(1.0 / 255.0) + np.float32(0.055))
        * np.float32(1.0 / 1.055)) ** np.float32(2.4)
    return jnp.where(v < 11, lo, hi)


def opsin_blocks_lanes(rgb):
    """Per-tile opsin of [3, 8, 8, N] linear RGB (OpsinDynamicsImage at
    8x8, butteraugli_comparator.cc:85-111), tiles-last."""
    bm = blur_matrix(8, consts.OPSIN_SIGMA, 0.0)
    blurred = _mat_x(bm, _mat_y(bm, rgb, jnp.float32), jnp.float32)

    mix = consts.OPSIN_MIX.astype(np.float32)
    bias = consts.OPSIN_BIAS.astype(np.float32)

    def absorbance(x):
        return jnp.stack(
            [np.float32(mix[c][0]) * x[0] + np.float32(mix[c][1]) * x[1]
             + np.float32(mix[c][2]) * x[2] + np.float32(bias[c])
             for c in range(3)], axis=0)

    pre = absorbance(blurred)
    sensitivity = gamma(pre) / pre
    cur = absorbance(rgb) * sensitivity
    xyb = consts.RGB_TO_XYB.astype(np.float32)
    return jnp.stack(
        [np.float32(xyb[c][0]) * cur[0] + np.float32(xyb[c][1]) * cur[1]
         + np.float32(xyb[c][2]) * cur[2] for c in range(3)], axis=0)


def mhic_lanes(t0, t1):
    """MaskHighIntensityChange confined to [3, 8, 8, N] tiles
    (butteraugli.cc:791, xsize=ysize=8), tiles-last."""
    ave = (t0 + t1) * 0.5
    y = ave[1]                                     # [8, 8, N]
    big = np.float32(-1.0)
    # Border-validity masks from iotas (not captured numpy constants, so
    # the same code runs inside a Pallas kernel).
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 8, 1), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (8, 8, 1), 1)
    valid_l = col >= 1
    valid_r = col <= 6
    valid_u = row >= 1
    valid_d = row <= 6

    def roll_nz(v, shift, axis):
        # jnp.roll by 0 still emits a zero-length slice, which the Mosaic
        # vector layout rejects ("sizes 0, 8, ..."); skip the no-op.
        return jnp.roll(v, shift, axis=axis) if shift else v

    def sq_shift(dy, dx, valid):
        shifted = roll_nz(roll_nz(y, -dy, 0), -dx, 1)
        d = shifted - y
        return jnp.where(valid, d * d, big)

    sqr_max = jnp.maximum(
        jnp.maximum(sq_shift(0, -1, valid_l), sq_shift(0, 1, valid_r)),
        jnp.maximum(sq_shift(-1, 0, valid_u), sq_shift(1, 0, valid_d)))

    red = consts.MHIC_REDUCTION.astype(np.float32)
    chroma = np.float32(consts.MHIC_CHROMA_BALANCE)
    chroma_scale = chroma / (y + chroma)
    mix = jnp.stack([
        chroma_scale * np.float32(red[0]) / (sqr_max + np.float32(red[0])),
        np.float32(red[1]) / (sqr_max + np.float32(red[1])),
        chroma_scale * np.float32(red[2]) / (sqr_max + np.float32(red[2])),
    ], axis=0)
    return mix * t0 + (1.0 - mix) * ave, mix * t1 + (1.0 - mix) * ave


_CSF64 = np.zeros((8, 8, 1), dtype=np.float32)
_CSF64.ravel()[:37] = consts.CSF8X8.astype(np.float32)
_CSF_MASK = np.zeros((8, 8, 1), dtype=np.float32)
_CSF_MASK.ravel()[4:37] = 1.0
# CSF indexed [xfreq*8 + yfreq], matching the [xf, yf, N] fft output
# (row-major flattening of the leading (8, 8) is exactly that order).
_CSF_D = np.ascontiguousarray(_CSF64 * _CSF_MASK)


def _fft8_sq_lanes(x, dot=False):
    """|2-D DFT|^2 of real [8(y), 8(x), N] -> [8(xf), 8(yf), N] with the
    global scale (ButteraugliFFTSquared, butteraugli.cc:574-597)."""
    a = jnp.swapaxes(x, 0, 1)                      # [x, y, N]
    t1r = _mat_y(bd.DFT8_RE, a, jnp.float32, dot)  # over x
    t1i = _mat_y(bd.DFT8_IM, a, jnp.float32, dot)
    gr = _mat_x(bd.DFT8_RE, t1r, jnp.float32, dot) \
        - _mat_x(bd.DFT8_IM, t1i, jnp.float32, dot)
    gi = _mat_x(bd.DFT8_IM, t1r, jnp.float32, dot) \
        + _mat_x(bd.DFT8_RE, t1i, jnp.float32, dot)
    return (gr * gr + gi * gi) * np.float32(consts.FFT_GLOBAL_MUL)


def _sum_small_axis(x, axis, n):
    """Unrolled sum over a small non-lane axis. Mosaic rejects
    vector.multi_reduction (ADD) over dimensions whose vector layout has
    nonzero offsets (the bisect's blocker for the fused lanes kernel);
    an explicit slice-add chain is layout-agnostic -- and fixes the
    accumulation order, like _mat_axis."""
    xs = [jax.lax.index_in_dim(x, i, axis, keepdims=False)
          for i in range(n)]
    acc = xs[0]
    for v in xs[1:]:
        acc = acc + v
    return acc


def _mean8_axis1(x):
    """[C, 8, N] -> [C, N] mean over the 8-axis."""
    return _sum_small_axis(x, 1, 8) * np.float32(0.125)


def block_diff_lanes(b0, b1, csfd=None, dot=False):
    """ButteraugliBlockDiff (butteraugli.cc:602-684) on [3, 8, 8, N]
    tiles-last pairs -> (diff_dc, diff_ac, diff_edge), each [3, N].

    ``csfd``: optional [8, 8, 1] masked-CSF weights operand (a Pallas
    kernel must pass the table as an input; XLA callers default to the
    module constant)."""
    csf0 = np.float32(consts.CSF8X8[0])
    diff = b0 - b1                                 # [3, 8, 8, N]

    avg = _mean8_axis1(_mean8_axis1(diff))         # [3, N]
    dcx, dcy, dcz = bd.xyb_diff_low_freq_squared(avg[0], avg[1], avg[2])
    diff_dc = jnp.stack([dcx, dcy, dcz], axis=0) * csf0

    edges = jnp.stack([
        _mean8_axis1(diff[:, :, 0, :]),
        _mean8_axis1(diff[:, 0, :, :]),
        _mean8_axis1(diff[:, :, 7, :]),
        _mean8_axis1(diff[:, 7, :, :]),
    ], axis=1)                                     # [3, 4, N]
    ex, ey, ez = bd.xyb_diff_low_freq_squared(edges[0], edges[1],
                                              edges[2])
    diff_edge = jnp.stack([ex.sum(0), ey.sum(0), ez.sum(0)],
                          axis=0) * csf0           # [3, N]

    bavg = (b0 + b1) * 0.5
    bhd = (b0 - b1) * 0.5
    y_avg = _fft8_sq_lanes(bavg[1], dot)
    y_hd = _fft8_sq_lanes(bhd[1], dot)

    d = jnp.asarray(_CSF_D) if csfd is None else csfd

    def wsum(x):                                   # [8, 8, N] -> [N]
        return jnp.sum(jnp.sum(d * x, axis=0), axis=0)

    ac_x = wsum(_fft8_sq_lanes(bhd[0], dot)) \
        * np.float32(consts.BLOCKDIFF_AC_XMUL)
    ac_z = wsum(_fft8_sq_lanes(bhd[2], dot)) \
        * np.float32(consts.BLOCKDIFF_AC_ZMUL)

    rng = np.float32(consts.BLOCKDIFF_Y_LIMIT)
    ya = jnp.sqrt(y_avg)
    yh = jnp.sqrt(y_hd)
    y0 = bd._remove_range_around_zero(ya - yh, rng)
    y1 = bd._remove_range_around_zero(ya + yh, rng)
    ymul2 = np.float32(consts.BLOCKDIFF_AC_YMUL2)
    valy0 = bd.color_diff_dy_hf(y0 * ymul2)
    valy1 = bd.color_diff_dy_hf(y1 * ymul2)
    valy = np.float32(consts.BLOCKDIFF_AC_YMUL) * (valy0 - valy1)
    ac_y = wsum(valy * valy)

    diff_ac = jnp.stack([ac_x, ac_y, ac_z], axis=0)
    return diff_dc, diff_ac, diff_edge


def _ycbcr_to_rgb_lanes(yy, cb, cr):
    """color_transform.h integer YCbCr -> RGB on [8, 8, N] byte planes."""
    cb = cb - 128
    cr = cr - 128
    r = yy + ((91881 * cr + 32768) >> 16)
    b = yy + ((116130 * cb + 32768) >> 16)
    g = yy + (((-46802) * cr + (-22554) * cb + 32768) >> 16)
    return jnp.clip(jnp.stack([r, g, b], axis=0), 0, 255)


def _finish_lanes(rgb, xyb0_t, scales_t):
    """sRGB bytes -> linear -> opsin -> MHIC -> block diff -> weighted
    scalar error (the shared tail of every CompareBlock mode)."""
    lin = _srgb_to_linear_lanes(rgb)
    xyb1 = opsin_blocks_lanes(lin)
    m0, m1 = mhic_lanes(xyb0_t, xyb1)
    dc, ac, edge = block_diff_lanes(m0, m1)
    diff = jnp.sum((dc + ac) * scales_t, axis=0)   # [N]
    diff_edge = jnp.sum(edge * scales_t, axis=0)
    return jnp.sqrt((1.0 - _BLOCK_EDGE_W) * diff
                    + _BLOCK_EDGE_W * diff_edge)


def compare_blocks_lanes444(cand, xyb0_t, scales_t, ymax, xmax):
    """Batched CompareBlock (butteraugli_comparator.cc:113-163) in the
    tiles-last layout.

    Args:
      cand: [N, 3, 64] int32 dequantized candidate coefficients (the
        zeroing loop's native ordering; transposed once here).
      xyb0_t: [3, 8, 8, N] float32 original opsin tiles (pre-transposed
        frozen pass state).
      scales_t: [3, N] float32 whole-image mask values.
      ymax, xmax: [N] int32 per-tile edge-replication clamp maxima.
    Returns [N] float32 block errors.
    """
    ct = jnp.transpose(cand.reshape(-1, 3, 8, 8), (1, 2, 3, 0))
    v = idct_lanes(ct)                             # [3, 8, 8, N] bytes
    v = edge_replicate_lanes(v, ymax, xmax)
    rgb = _ycbcr_to_rgb_lanes(v[0], v[1], v[2])
    return _finish_lanes(rgb, xyb0_t, scales_t)


def compare_blocks_lanes420y(cand_y, chroma_t, xyb0_t, scales_t,
                             ymax, xmax):
    """420 Y-pass CompareBlock, tiles-last: candidate Y tiles against
    frozen upsampled chroma bytes (ops/tiles.compare_blocks_420y twin).

    cand_y: [N, 64] int32; chroma_t: [2, 8, 8, N] int32 (already
    edge-replicated); rest as compare_blocks_lanes444.
    """
    ct = jnp.transpose(cand_y.reshape(-1, 8, 8), (1, 2, 0))   # [8, 8, N]
    yv = idct_lanes(ct)
    yv = edge_replicate_lanes(yv, ymax, xmax)
    rgb = _ycbcr_to_rgb_lanes(yv, chroma_t[0], chroma_t[1])
    return _finish_lanes(rgb, xyb0_t, scales_t)


def _sel_rows(v, idx):
    """Static row selection [10, ..., N] -> [len(idx), ..., N]: unrolled
    constant-index slices (a fancy-index would lower to a gather)."""
    return jnp.stack([v[i] for i in idx], axis=0)


def _sel_cols(v, idx):
    return jnp.stack([v[:, i] for i in idx], axis=1)


def upsample_16x16_lanes(neigh):
    """[10, 10, N] x16 subsampled neighborhoods -> [16, 16, N] x16
    full-res pixels (ops/upsample.upsample_16x16_from_neighborhood,
    tiles-last)."""
    x = np.arange(16)
    cx = (x >> 1) + 1
    cx2 = cx + (x & 1) * 2 - 1
    r1 = _sel_rows(neigh, cx)
    r2 = _sel_rows(neigh, cx2)
    s00 = _sel_cols(r1, cx)
    s01 = _sel_cols(r1, cx2)
    s10 = _sel_cols(r2, cx)
    s11 = _sel_cols(r2, cx2)
    return (9 * s00 + 3 * s01 + 3 * s10 + s11) >> 4


def _split16_lanes(p):
    """[16, 16, N] -> [8, 8, 4N]: the 2x2 sub-block grid folded into the
    lane axis (order (sub_y, sub_x, n), n fastest)."""
    n = p.shape[-1]
    q = p.reshape(2, 8, 2, 8, n)            # (sy, y, sx, x, n)
    return jnp.transpose(q, (1, 3, 0, 2, 4)).reshape(8, 8, 4 * n)


def compare_blocks_lanes420c(cand_u, cand_v, neigh_u_t, neigh_v_t,
                             y16s, xyb0_s, scales_s, ymax_s, xmax_s,
                             valid_t):
    """420 chroma-pass CompareBlock over 16x16 macroblocks, tiles-last
    (ops/tiles.compare_blocks_420c twin): the 2x2 sub-block grid is
    folded into the lane axis so the whole evaluation reuses the lane
    helpers at 4N lanes.

    Args:
      cand_u, cand_v: [N, 64] int32 candidate chroma coefficients.
      neigh_u_t, neigh_v_t: [10, 10, N] int32 frozen x16 subsampled
        planes.
      y16s: [8, 8, 4N] int32 frozen Y bytes, pre-split per sub-block.
      xyb0_s: [3, 8, 8, 4N]; scales_s: [3, 4N]; ymax_s, xmax_s: [4N];
      valid_t: [2, 2, N] bool (sub-block inside the image).
    Returns [N] max sub-block errors.
    """
    def chroma16(cand, neigh_t):
        v = idct_lanes(jnp.transpose(cand.reshape(-1, 8, 8), (1, 2, 0)))
        filled = neigh_t.at[1:9, 1:9, :].set(v << 4)
        return upsample_16x16_lanes(filled)

    u16 = chroma16(cand_u, neigh_u_t)
    v16 = chroma16(cand_v, neigh_v_t)
    # ToPixels dither: x = 16*bx + ix, so parity is ix&1 (axis 1 here).
    dith = jnp.asarray(8 - (np.arange(16) & 1))[None, :, None]
    ub = _split16_lanes((u16 + dith) >> 4)
    vb = _split16_lanes((v16 + dith) >> 4)

    rep = lambda p: edge_replicate_lanes(p, ymax_s, xmax_s)  # noqa: E731
    rgb = _ycbcr_to_rgb_lanes(rep(y16s), rep(ub), rep(vb))
    errs = _finish_lanes(rgb, xyb0_s, scales_s)              # [4N]
    errs = errs.reshape(2, 2, -1)
    errs = jnp.where(valid_t, errs, 0.0)     # max_err starts at 0
    return jnp.max(jnp.max(errs, axis=0), axis=0)


def transpose_aux_420c(neigh_u, neigh_v, y16, xyb0_sub, scales_sub,
                       ysel_sub, xsel_sub, valid_sub):
    """Frozen 420 chroma-pass state -> tiles-last, sub-blocks folded into
    lanes (order (sub_y, sub_x, n))."""
    n = jnp.asarray(neigh_u).shape[0]
    nu = jnp.transpose(jnp.asarray(neigh_u), (1, 2, 0))
    nv = jnp.transpose(jnp.asarray(neigh_v), (1, 2, 0))
    y16s = _split16_lanes(jnp.transpose(jnp.asarray(y16), (1, 2, 0)))
    x0 = jnp.asarray(xyb0_sub).reshape(n, 2, 2, 3, 8, 8)
    x0 = jnp.transpose(x0, (3, 4, 5, 1, 2, 0)).reshape(3, 8, 8, 4 * n)
    sc = jnp.transpose(jnp.asarray(scales_sub), (3, 1, 2, 0)) \
        .reshape(3, 4 * n)
    ymax = jnp.transpose(jnp.asarray(ysel_sub)[..., 7], (1, 2, 0)) \
        .reshape(4 * n).astype(jnp.int32)
    xmax = jnp.transpose(jnp.asarray(xsel_sub)[..., 7], (1, 2, 0)) \
        .reshape(4 * n).astype(jnp.int32)
    valid = jnp.transpose(jnp.asarray(valid_sub), (1, 2, 0))
    return nu, nv, y16s, x0, sc, ymax, xmax, valid


def transpose_aux_420y(chroma_bytes, xyb0_tiles, scales, ysel, xsel):
    """Frozen 420 Y-pass state -> tiles-last: [N, 2, 8, 8] chroma bytes to
    [2, 8, 8, N] plus the 444 aux transposes."""
    ch = jnp.transpose(jnp.asarray(chroma_bytes), (1, 2, 3, 0))
    return (ch,) + transpose_aux_444(xyb0_tiles, scales, ysel, xsel)


def transpose_aux_444(xyb0_tiles, scales, ysel, xsel):
    """Frozen 444 pass state -> tiles-last form: [N, 3, 64] opsin tiles to
    [3, 8, 8, N], [N, 3] scales to [3, N], [N, 8] clamped index vectors to
    their [N] maxima (the vectors encode a single min(i, max) clamp)."""
    x0 = jnp.transpose(
        jnp.reshape(xyb0_tiles, (-1, 3, 8, 8)), (1, 2, 3, 0))
    sc = jnp.transpose(jnp.asarray(scales), (1, 0))
    ymax = jnp.asarray(ysel)[:, 7].astype(jnp.int32)
    xmax = jnp.asarray(xsel)[:, 7].astype(jnp.int32)
    return x0, sc, ymax, xmax
