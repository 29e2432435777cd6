"""Fused Pallas TPU kernel for the per-block butteraugli compare.

This is the hot inner op of the zeroing search (SURVEY.md §3.2): candidate
coefficients -> integer IDCT -> sRGB -> linear -> 8x8 opsin ->
MaskHighIntensityChange -> FFT block diff -> masked error. The XLA version
(ops/tiles.py) emits ~40 small kernels per evaluation; here the whole
pipeline runs in VMEM in one pass over a tile batch.

Design notes:
  * every 8-point contraction (IDCT, opsin blur, DFT) is unrolled into
    constant-scalar FMAs on [T, ...] vectors -- no tiny matmuls, pure VPU;
  * the integer IDCT stays in int32 (products reach 2^27, beyond float32
    mantissa) with the reference's exact rounding shifts;
  * the piecewise-linear color-difference LUTs collapse to closed forms
    (they are arithmetic progressions, butteraugli.cc:200-247), and the
    sRGB->linear LUT is evaluated arithmetically (gamma_correct.cc:23-33);
    the sRGB power is the one float32-vs-double divergence from the XLA
    path (~1e-6 relative, far inside the metric's float tolerance);
  * the per-tile edge replication (ToPixels, output_image.cc:86-97) is a
    pair of per-tile 0/1 selection matrices instead of a dynamic gather.

Status: semantics validated against the XLA pipeline (tests/
test_pallas_kernel.py) and end-to-end byte-identical on the golden crop;
enabled via GUETZLI_TPU_PALLAS=1. The axon remote AOT Mosaic toolchain
currently aborts compiling the fully-unrolled kernel (tpu_compile_helper
SIGABRT); on such deployments the kernel runs in interpret mode for
verification only and the XLA pipeline stays the production path.
"""

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from guetzli_tpu import consts
from guetzli_tpu.ops.blur import blur_matrix

# Tiles per grid step. At 256 the Mosaic register allocator's spill
# slots alone need 128.82 MB of VMEM -- 836 KB over the v5e's 128 MB
# (tpu_r03 bisect); 128 halves the spill footprint and fits the raised
# scoped-VMEM budget (see _tile_compare_pallas). Tunable while measuring.
from guetzli_tpu import config as _config
TILE = _config.current().pallas_tile

# Dot-based contraction lowering (smaller MLIR for the AOT Mosaic helper);
# numerically equivalent within f32 rounding of the unrolled-FMA default.
# Pinned off in round 5 (flag deleted): dot contractions fail Mosaic
# lowering inside the production kernels (constant capture,
# tpu_r05_dot_fused_1m.log) and this blocks-leading kernel is itself the
# opt-in legacy path; the machinery below stays for the interpret-mode
# tests that cover it.
USE_DOT = False

# -- compile-time constant tables ----------------------------------------
_IDCT = consts.IDCT_MATRIX.astype(np.int32)              # [y, u]
_BM = blur_matrix(8, consts.OPSIN_SIGMA, 0.0)            # [8, 8] f32
_u = np.arange(8)
_W = np.exp(-2j * np.pi * np.outer(_u, _u) / 8.0)
_DFT_RE = _W.real.astype(np.float32)
_DFT_IM = _W.imag.astype(np.float32)
_CSF = consts.CSF8X8.astype(np.float32)                  # [37]
_OPSIN_MIX = consts.OPSIN_MIX.astype(np.float32)         # [3, 3]
_OPSIN_BIAS = consts.OPSIN_BIAS.astype(np.float32)
_RGB_TO_XYB = consts.RGB_TO_XYB.astype(np.float32)
_MHIC_RED = consts.MHIC_REDUCTION.astype(np.float32)

# Arithmetic-progression parameters of the piecewise-linear LUTs
# (butteraugli.cc:200-247): lut[0]=0, lut[1]=off, lut[i]=off+(i-1)*inc.
_DY_OFF = np.float32(1.4103373714040413)
_DY_INC = np.float32(0.7084088867024)
_LFY_INC = np.float32(5.2511644570349185)


def _mat8(vec_fn, mat, x, axis):
    """out[..., i, ...] = sum_j mat[i, j] * x[..., j, ...] along `axis`,
    unrolled into constant FMAs. x has static 8 extent on `axis`."""
    parts = []
    xs = [jax.lax.index_in_dim(x, j, axis, keepdims=False)
          for j in range(8)]
    for i in range(8):
        acc = vec_fn(mat[i][0]) * xs[0]
        for j in range(1, 8):
            acc = acc + vec_fn(mat[i][j]) * xs[j]
        parts.append(acc)
    return jnp.stack(parts, axis=axis)


def _i32(v):
    return jnp.int32(v)


def _f32(v):
    return jnp.float32(v)


def _idct_int(c):
    """Exact integer IDCT of [T, 3, 8, 8] (u, x) blocks (idct.cc)."""
    # Column pass: col[y, x] = (sum_u M[y,u] c[u,x] + 1<<10) >> 11
    col = _mat8(_i32, _IDCT, c, axis=2)
    col = (col + (1 << 10)) >> 11
    # Row pass: out[y, x] = (sum_u M[x,u] col[y,u] + 257<<17) >> 18
    row = _mat8(_i32, _IDCT, col, axis=3)
    row = (row + (257 << 17)) >> 18
    return jnp.clip(row, 0, 255)


def _srgb_to_linear(v):
    """Arithmetic form of the 256-entry LUT (gamma_correct.cc:23-33)."""
    vf = v.astype(jnp.float32)
    lo = vf * _f32(1.0 / 12.92)
    hi = _f32(255.0) * ((vf * _f32(1.0 / 255.0) + _f32(0.055))
                        * _f32(1.0 / 1.055)) ** _f32(2.4)
    return jnp.where(v < 11, lo, hi)


def _pw_linear(off, inc, s):
    """interpolate() against an arithmetic-progression LUT of 21 entries."""
    ix = jnp.abs(s)
    res = jnp.where(
        ix < 1.0, ix * off,
        jnp.minimum(off + (ix - 1.0) * inc, off + 19.0 * inc))
    return jnp.where(s < 0, -res, res)


def _pw_linear_zero(inc, s):
    ix = jnp.abs(s)
    res = jnp.minimum(ix * inc, 20.0 * inc)
    return jnp.where(s < 0, -res, res)


def _gamma(v):
    """Rational polynomial gamma via Clenshaw (butteraugli.cc:869-941)."""
    x01 = (v - _f32(consts.GAMMA_MIN_VALUE)) * _f32(
        1.0 / (consts.GAMMA_MAX_VALUE - consts.GAMMA_MIN_VALUE))
    xc = 2.0 * x01 - 1.0

    def clenshaw(coeffs):
        b1 = jnp.zeros_like(xc)
        b2 = jnp.zeros_like(xc)
        for c in coeffs[:0:-1]:
            t = (xc * b1) * 2.0 - b2 + _f32(c)
            b2 = b1
            b1 = t
        return xc * b1 - b2 + _f32(coeffs[0])

    return clenshaw(consts.GAMMA_P) / clenshaw(consts.GAMMA_Q)


def _opsin8x8(rgb, mats=None):
    """[T, 3, 8, 8] linear RGB -> XYB opsin (tile-confined blur)."""
    # blurred = BM @ rgb @ BM^T: out[..., i, l] = sum_{j,k} BM[i,j]
    # rgb[..., j, k] BM[l, k] -- row contraction uses BM rows on axis 3.
    if USE_DOT:
        blurred = _transform2d(rgb, mats[0], mats[0])
    else:
        blurred = _mat8(_f32, _BM, _mat8(_f32, _BM, rgb, axis=3), axis=2)

    def absorbance(x):
        out = []
        for c in range(3):
            acc = (_f32(_OPSIN_MIX[c][0]) * x[:, 0]
                   + _f32(_OPSIN_MIX[c][1]) * x[:, 1]
                   + _f32(_OPSIN_MIX[c][2]) * x[:, 2]
                   + _f32(_OPSIN_BIAS[c]))
            out.append(acc)
        return jnp.stack(out, axis=1)

    pre = absorbance(blurred)
    sensitivity = _gamma(pre) / pre
    cur = absorbance(rgb) * sensitivity
    out = []
    for c in range(3):
        acc = (_f32(_RGB_TO_XYB[c][0]) * cur[:, 0]
               + _f32(_RGB_TO_XYB[c][1]) * cur[:, 1]
               + _f32(_RGB_TO_XYB[c][2]) * cur[:, 2])
        out.append(acc)
    return jnp.stack(out, axis=1)


_COL = np.arange(8, dtype=np.float32)[None, :] * np.ones((8, 1), np.float32)
_ROW = _COL.T


def _mhic(t0, t1):
    """MaskHighIntensityChange on [T, 3, 8, 8] tiles (butteraugli.cc:791).

    The reference evaluates sqr(shifted - y) only where the neighbor is in
    the 8x8 tile, taking max over available neighbors with -1 elsewhere.
    """
    ave = (t0 + t1) * 0.5
    y = ave[:, 1]
    big = _f32(-1.0)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 1)

    def sq(dy, dx):
        # neighbor value at (y+dy, x+dx)
        sh = y
        if dy == -1:
            sh = jnp.concatenate([sh[:, 0:1, :], sh[:, :7, :]], axis=1)
        elif dy == 1:
            sh = jnp.concatenate([sh[:, 1:, :], sh[:, 7:8, :]], axis=1)
        if dx == -1:
            sh = jnp.concatenate([sh[:, :, 0:1], sh[:, :, :7]], axis=2)
        elif dx == 1:
            sh = jnp.concatenate([sh[:, :, 1:], sh[:, :, 7:8]], axis=2)
        d = sh - y
        d = d * d
        if dx == -1:
            valid = col >= 1
        elif dx == 1:
            valid = col <= 6
        elif dy == -1:
            valid = row >= 1
        else:
            valid = row <= 6
        return jnp.where(valid[None, :, :], d, big)

    sqr_max = jnp.maximum(jnp.maximum(sq(0, -1), sq(0, 1)),
                          jnp.maximum(sq(-1, 0), sq(1, 0)))
    chroma_scale = _f32(consts.MHIC_CHROMA_BALANCE) / (
        y + _f32(consts.MHIC_CHROMA_BALANCE))
    mix = jnp.stack([
        chroma_scale * _f32(_MHIC_RED[0]) / (sqr_max + _f32(_MHIC_RED[0])),
        _f32(_MHIC_RED[1]) / (sqr_max + _f32(_MHIC_RED[1])),
        chroma_scale * _f32(_MHIC_RED[2]) / (sqr_max + _f32(_MHIC_RED[2])),
    ], axis=1)
    return mix * t0 + (1.0 - mix) * ave, mix * t1 + (1.0 - mix) * ave


def _fft8_sq(x, mats=None):
    """|2-D DFT|^2 of real [T, 8, 8] (y, x) -> [T, 8, 8] laid out
    [xfreq, yfreq] with the 0.000064 scale (butteraugli.cc:574-597)."""
    a = jnp.swapaxes(x, -1, -2)                  # [T, x, y]
    if USE_DOT:
        wre_t, wim_t = mats[1], mats[2]
        gr = _transform2d(a, wre_t, wre_t) - _transform2d(a, wim_t, wim_t)
        gi = _transform2d(a, wre_t, wim_t) + _transform2d(a, wim_t, wre_t)
    else:
        t1r = _mat8(_f32, _DFT_RE, a, axis=1)
        t1i = _mat8(_f32, _DFT_IM, a, axis=1)
        gr = _mat8(_f32, _DFT_RE, t1r, axis=2) - _mat8(_f32, _DFT_IM, t1i,
                                                       axis=2)
        gi = _mat8(_f32, _DFT_IM, t1r, axis=2) + _mat8(_f32, _DFT_RE, t1i,
                                                       axis=2)
    return (gr * gr + gi * gi) * _f32(consts.FFT_GLOBAL_MUL)


def _xyb_lf_vals(x, y, z):
    z2 = z + _f32(consts.XYB_LF_Y_TO_Z) * y
    vx = x * _f32(consts.XYB_LF_XMUL)
    vy = _pw_linear_zero(_LFY_INC, y * _f32(consts.XYB_LF_YMUL))
    vz = z2 * _f32(consts.XYB_LF_ZMUL)
    return vx, vy, vz


def _remove_range(v, rng):
    return jnp.where((v >= -rng) & (v < rng), 0.0,
                     jnp.where(v < 0, v + rng, v - rng))


_CSF64 = np.zeros(64, dtype=np.float32)
_CSF64[:37] = _CSF
_CSF_MASK = np.zeros(64, dtype=np.float32)
_CSF_MASK[4:37] = 1.0


def _block_diff(b0, b1, d, mats=None):
    """ButteraugliBlockDiff on [T, 3, 8, 8] (y, x) tiles -> three
    3-tuples of [T, 1] accumulators (dc, ac, edge_dc) per channel.
    `d` = masked CSF weights [8, 8].

    Every intermediate stays rank >= 2 and no [T, 3] concatenates are
    formed: Mosaic's layout inference aborts on rank-1 vectors and on
    lane-offset-shifting concats, so channel scalars stay as separate
    [T, 1] values."""
    diff = b0 - b1

    def mean2(x):
        # [T, 8, 8] -> [T, 1] stepwise (no two-trailing-dims reduce)
        return jnp.mean(jnp.mean(x, axis=-1), axis=-1, keepdims=True)

    csf0 = _f32(_CSF[0])
    avg = [mean2(diff[:, c]) for c in range(3)]
    dcx, dcy, dcz = _xyb_lf_vals(avg[0], avg[1], avg[2])
    diff_dc = (dcx * dcx * csf0, dcy * dcy * csf0, dcz * dcz * csf0)

    # Four 8x8-edge means per channel, kept as separate [T, 1] scalars.
    def edge_means(c):
        return [jnp.mean(diff[:, c, :, 0], axis=-1, keepdims=True),
                jnp.mean(diff[:, c, 0, :], axis=-1, keepdims=True),
                jnp.mean(diff[:, c, :, 7], axis=-1, keepdims=True),
                jnp.mean(diff[:, c, 7, :], axis=-1, keepdims=True)]

    e0, e1, e2 = edge_means(0), edge_means(1), edge_means(2)
    acc = [jnp.zeros_like(diff[:, 0, 0, 0:1]) for _ in range(3)]
    for k in range(4):
        ex, ey, ez = _xyb_lf_vals(e0[k], e1[k], e2[k])
        acc[0] = acc[0] + ex * ex
        acc[1] = acc[1] + ey * ey
        acc[2] = acc[2] + ez * ez
    diff_edge = (acc[0] * csf0, acc[1] * csf0, acc[2] * csf0)

    bavg = (b0 + b1) * 0.5
    bhd = (b0 - b1) * 0.5
    y_avg = _fft8_sq(bavg[:, 1], mats)
    x_hd = _fft8_sq(bhd[:, 0], mats)
    y_hd = _fft8_sq(bhd[:, 1], mats)
    z_hd = _fft8_sq(bhd[:, 2], mats)

    def sum2(x):
        # [T, 8, 8] -> [T, 1] without a rank-1 intermediate
        return jnp.sum(jnp.sum(x, axis=-1), axis=-1, keepdims=True)

    ac_x = sum2(d[None] * x_hd) * _f32(consts.BLOCKDIFF_AC_XMUL)
    ac_z = sum2(d[None] * z_hd) * _f32(consts.BLOCKDIFF_AC_ZMUL)

    ya = jnp.sqrt(y_avg)
    yh = jnp.sqrt(y_hd)
    rng = _f32(consts.BLOCKDIFF_Y_LIMIT)
    y0 = _remove_range(ya - yh, rng)
    y1 = _remove_range(ya + yh, rng)
    ymul2 = _f32(consts.BLOCKDIFF_AC_YMUL2)
    valy0 = _pw_linear(_DY_OFF, _DY_INC, y0 * ymul2)
    valy1 = _pw_linear(_DY_OFF, _DY_INC, y1 * ymul2)
    valy = _f32(consts.BLOCKDIFF_AC_YMUL) * (valy0 - valy1)
    ac_y = sum2(d[None] * valy * valy)

    diff_ac = (ac_x, ac_y, ac_z)
    return diff_dc, diff_ac, diff_edge


def _kernel(cand_ref, xyb0_ref, scale_ref, sy_ref, sx_ref, csfd_ref,
            mats_ref, out_ref):
    mats = mats_ref[...]
    vals = _idct_int(cand_ref[...])
    # Edge replication: v2 = Sy @ v @ Sx^T with per-tile 0/1 matrices.
    sy = sy_ref[...]
    sx = sx_ref[...]

    # Edge replication per channel with [T, 8] intermediates: the
    # selection scalar slices are [T, 1], so every multiply broadcasts
    # lanes only (Mosaic cannot broadcast sublanes and lanes in one op).
    chans = []
    for c in range(3):
        vc = vals[:, c]                            # [T, 8, 8] (y, x)
        rows = [None] * 8
        for i in range(8):
            acc = sy[:, i, 0:1] * vc[:, 0, :]
            for j in range(1, 8):
                acc = acc + sy[:, i, j:j + 1] * vc[:, j, :]
            rows[i] = acc                          # [T, 8] over x
        v2 = jnp.stack(rows, axis=1)               # [T, 8, 8] (y, x)
        cols = [None] * 8
        for i in range(8):
            acc = sx[:, i, 0:1] * v2[:, :, 0]
            for j in range(1, 8):
                acc = acc + sx[:, i, j:j + 1] * v2[:, :, j]
            cols[i] = acc                          # [T, 8] over y
        chans.append(jnp.stack(cols, axis=2))      # [T, 8, 8] (y, x)
    v = jnp.stack(chans, axis=1)                   # [T, 3, 8, 8] bytes

    # YCbCr -> RGB (color_transform.h), integer.
    yy = v[:, 0]
    cb = v[:, 1] - 128
    cr = v[:, 2] - 128
    r = yy + ((91881 * cr + 32768) >> 16)
    b = yy + ((116130 * cb + 32768) >> 16)
    g = yy + (((-46802) * cr + (-22554) * cb + 32768) >> 16)
    rgb = jnp.clip(jnp.stack([r, g, b], axis=1), 0, 255)

    lin = _srgb_to_linear(rgb)
    xyb1 = _opsin8x8(lin, mats)
    m0, m1 = _mhic(xyb0_ref[...], xyb1)
    dc, ac, edge = _block_diff(m0, m1, csfd_ref[...], mats)

    scale = scale_ref[...]                         # [T, 3]
    diff = jnp.zeros_like(dc[0])
    diff_edge = jnp.zeros_like(dc[0])
    for c in range(3):
        sc = scale[:, c:c + 1]
        diff = diff + (dc[c] + ac[c]) * sc
        diff_edge = diff_edge + edge[c] * sc
    w = _f32(consts.BLOCK_EDGE_WEIGHT)
    out_ref[...] = jnp.sqrt((1.0 - w) * diff + w * diff_edge)


def _selection_matrices(ysel, xsel):
    """[N, 8] clamped gather indices -> [N, 8, 8] 0/1 selection."""
    eye = np.arange(8)
    sy = (np.asarray(ysel)[:, :, None] == eye[None, None, :])
    sx = (np.asarray(xsel)[:, :, None] == eye[None, None, :])
    return sy.astype(np.int32), sx.astype(np.int32)


def tile_compare_pallas(cand, xyb0_tiles, scales, sy, sx, interpret=None):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _tile_compare_pallas(cand, xyb0_tiles, scales, sy, sx,
                                interpret)


@partial(jax.jit, static_argnames=("interpret",))
def _tile_compare_pallas(cand, xyb0_tiles, scales, sy, sx,
                         interpret=False):
    """Fused per-tile compare.

    Args:
      cand: [N, 3, 64] int32 dequantized candidate coefficients
        (N a multiple of TILE; pad with zeros); reshaped to blocks outside
        the kernel (Mosaic rejects minor-dim shape casts in-kernel).
      xyb0_tiles: [N, 3, 64] f32 (flat storage); scales: [N, 3] f32;
      sy, sx: [N, 8, 8] int32 selection matrices.
    Returns [N] float32 block errors.
    """
    n = cand.shape[0]
    assert n % TILE == 0, n
    grid = (n // TILE,)
    # The r03 bisect localized the Mosaic failure precisely: every stage
    # of this kernel compiles but needs ~64 MB of scoped VMEM scratch at
    # TILE=128 against the 16 MB default ("Scoped allocation ... exceeded
    # scoped vmem limit"). vmem_limit_bytes raises the budget; v5e has
    # 128 MB of VMEM. Tunable while measuring (GUETZLI_TPU_PALLAS_VMEM_MB).
    vmem_mb = _config.current().pallas_vmem_mb
    params = pltpu.CompilerParams(vmem_limit_bytes=vmem_mb << 20)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        compiler_params=params,
        in_specs=[
            pl.BlockSpec((TILE, 3, 8, 8), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 3, 8, 8), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 8, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 8, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 8, 8), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        interpret=interpret,
    )(cand.reshape(-1, 3, 8, 8), xyb0_tiles.reshape(-1, 3, 8, 8),
      scales, sy, sx,
      jnp.asarray((_CSF64 * _CSF_MASK).reshape(8, 8)),
      jnp.asarray(np.stack([_BM.T, _DFT_RE.T, _DFT_IM.T])))
    return out[:, 0]


# ---------------------------------------------------------------------
# v2 lowering helpers: contractions as dot_general (the unrolled-FMA form
# produces ~150 KB of MLIR, which the axon AOT Mosaic helper aborts on;
# dots shrink the program ~20x). Used when GUETZLI_TPU_PALLAS_DOT=1.
# ---------------------------------------------------------------------

def _matmul_last(x, mat_t):
    """Contract the last axis of x [..., k] with mat_t [k, i] -> [..., i]."""
    return jax.lax.dot_general(
        x, mat_t, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _transform2d(x, a_t, b_t):
    """out = a @ x @ b^T for [..., 8, 8] via two last-axis dots; a_t/b_t
    are the transposed matrices as traced values (pallas kernels may not
    capture array constants)."""
    t = _matmul_last(x, b_t)                       # [..., j, i]
    t = jnp.swapaxes(t, -1, -2)                    # [..., i, j]
    t = _matmul_last(t, a_t)                       # [..., i, m]
    return jnp.swapaxes(t, -1, -2)
