"""Batched 8x8 butteraugli block difference (butteraugli.cc:352-684).

The reference computes, per 8x8 block pair: DC/edge average differences
mapped through a low-frequency psychovisual distance, and an AC difference
from the squared magnitudes of 2-D 8-point real FFTs weighted by a contrast
sensitivity matrix. Here every step is batched over an arbitrary leading
block axis, and the FFTs are expressed as 8x8 matrix products so they run on
the MXU (six small matmuls per channel instead of a butterfly network).
"""

import jax
import jax.numpy as jnp
import numpy as np

_HI = jax.lax.Precision.HIGHEST

from guetzli_tpu import consts

# 8-point DFT matrix, split into real and imaginary parts.
_u = np.arange(8)
_W = np.exp(-2j * np.pi * np.outer(_u, _u) / 8.0)
DFT8_RE = np.ascontiguousarray(_W.real.astype(np.float32))
DFT8_IM = np.ascontiguousarray(_W.imag.astype(np.float32))


def interpolate(lut, s):
    """Odd (sign-preserving) piecewise-linear LUT (butteraugli.cc:249-263).

    Table reads avoid gather (slow on the TPU vector units): small tables
    via a one-hot contraction, larger ones via a two-level factored
    one-hot (both exact -- each contraction sums a single 1.0 * value
    term at HIGHEST precision)."""
    lut_np = np.asarray(lut, dtype=np.float32)
    lut = jnp.asarray(lut_np)
    n = lut_np.shape[0]
    ix = jnp.abs(s)
    base = jnp.clip(ix.astype(jnp.int32), 0, n - 1)
    safe = jnp.minimum(base, n - 2)
    frac = ix - base.astype(ix.dtype)
    # lut[safe] and lut[safe+1] in one pass: pairs[k] = (lut[k], lut[k+1]).
    pairs_np = np.stack([lut_np, np.roll(lut_np, -1)], axis=-1)
    if n <= 64:
        oh = (safe[..., None]
              == jnp.arange(n, dtype=jnp.int32)).astype(s.dtype)
        l01 = jnp.einsum('...n,np->...p', oh, jnp.asarray(pairs_np),
                         precision=_HI)
    else:
        assert n % 32 == 0
        hi_n = n // 32
        oh_a = (jnp.right_shift(safe, 5)[..., None]
                == jnp.arange(hi_n, dtype=jnp.int32)).astype(s.dtype)
        sub = jnp.einsum(
            '...a,abp->...bp', oh_a,
            jnp.asarray(pairs_np.reshape(hi_n, 32, 2)), precision=_HI)
        oh_b = ((safe & 31)[..., None]
                == jnp.arange(32, dtype=jnp.int32)).astype(s.dtype)
        l01 = jnp.einsum('...b,...bp->...p', oh_b, sub, precision=_HI)
    l0, l1 = l01[..., 0], l01[..., 1]
    res = l0 + frac * (l1 - l0)
    res = jnp.where(base >= n - 1, lut[n - 1], res)
    return jnp.where(s < 0, -res, res)


def interpolate_clamp_negative(lut, s):
    """As interpolate() but clamping inputs below zero (butteraugli.cc:265)."""
    return interpolate(lut, jnp.maximum(s, 0.0))


def _pw_progression(off, inc, s):
    """interpolate() against a 21-entry arithmetic-progression LUT
    (consts._cumulative_lut: lut[0]=0, lut[1]=off, lut[i]=off+(i-1)*inc),
    in closed form: ~4 vector ops instead of a 21-wide one-hot
    contraction. Equal to the LUT read up to f32 rounding (the LUT
    accumulates in float64 then rounds; this evaluates off+(ix-1)*inc
    directly)."""
    off = np.float32(off)
    inc = np.float32(inc)
    ix = jnp.abs(s)
    if off:
        res = jnp.where(ix < 1.0, ix * off,
                        jnp.minimum(off + (ix - 1.0) * inc,
                                    off + np.float32(19.0) * inc))
    else:
        res = jnp.minimum(ix * inc, np.float32(20.0) * inc)
    return jnp.where(s < 0, -res, res)


def _use_exact_lut():
    from guetzli_tpu import config
    return config.current().exact_lut


def color_diff_dy_hf(s):
    """HF_COLOR_DIFF_DY read (butteraugli.cc:200-211)."""
    if _use_exact_lut():
        return interpolate(consts.HF_COLOR_DIFF_DY, s)
    return _pw_progression(1.4103373714040413, 0.7084088867024, s)


def color_diff_dx_hf(s):
    """HF_COLOR_DIFF_DX read (butteraugli.cc:213-224)."""
    if _use_exact_lut():
        return interpolate(consts.HF_COLOR_DIFF_DX, s)
    return _pw_progression(11.38708334481672, 14.550189611520716, s)


def color_diff_dy_lf(s):
    """LF_COLOR_DIFF_DY read (butteraugli.cc:236-247)."""
    if _use_exact_lut():
        return interpolate(consts.LF_COLOR_DIFF_DY, s)
    return _pw_progression(0.0, 5.2511644570349185, s)


def mask_lut(key, s):
    """Masking LUT read (butteraugli.cc:1242-1254 + Mask :1495-1567).

    The 512-entry tables sample the smooth rational
    ``(1 + extmul * (mul / (0.01 * scaler * i + offset) + extoff))^2``;
    the default evaluates it directly at the (clamped) input -- ~6
    vector ops instead of a two-level factored one-hot read, within
    ~1e-5 relative of the piecewise-linear table interpolation (the
    function's curvature over one table step is tiny).
    GUETZLI_TPU_EXACT_LUT=1 restores the table read."""
    if _use_exact_lut():
        return interpolate_clamp_negative(consts.MASK_LUTS[key], s)
    extmul, extoff, mul, offset, scaler = (
        np.float32(v) for v in consts.MASK_LUT_PARAMS[key])
    ix = jnp.clip(s, 0.0, np.float32(511.0))
    c = mul / (np.float32(0.01) * scaler * ix + offset)
    v = 1.0 + extmul * (c + extoff)
    return v * v


def xyb_low_freq_to_vals(x, y, z):
    """butteraugli.cc:305-315."""
    z = z + np.float32(consts.XYB_LF_Y_TO_Z) * y
    valz = z * np.float32(consts.XYB_LF_ZMUL)
    valx = x * np.float32(consts.XYB_LF_XMUL)
    valy = color_diff_dy_lf(y * np.float32(consts.XYB_LF_YMUL))
    return valx, valy, valz


def xyb_diff_low_freq_squared(x, y, z):
    """XybDiffLowFreqSquaredAccumulate against (0,0,0), factor 1."""
    vx, vy, vz = xyb_low_freq_to_vals(x, y, z)
    return vx * vx, vy * vy, vz * vz


def fft8x8_squared(blocks):
    """|2-D DFT|^2 of real [..., 8, 8] blocks, flattened [xfreq*8 + yfreq].

    Matches ButteraugliFFTSquared (butteraugli.cc:574-597) including its
    output layout (frequency along image x is the slow axis) and the global
    0.000064 scale.

    The two DFT stages run as single large 2-D matmuls (the batch axis is
    folded into the free dimension) rather than batches of 8x8 dots --
    the MXU is fed one [8, 8N] contraction instead of N tiny ones.
    """
    wr = jnp.asarray(DFT8_RE)
    wi = jnp.asarray(DFT8_IM)
    a = jnp.swapaxes(blocks, -1, -2)  # [..., x, y]
    lead = a.shape[:-2]
    n = int(np.prod(lead)) if lead else 1
    if jax.default_backend() == "cpu":
        # Batch-size-independent form: per-block 8x8 dots. The big-matmul
        # form below rounds differently per free-dim size on the CPU
        # backend (Eigen picks FMA vs mul+add GEMM kernels by shape),
        # which would break the byte-identity contracts (lockstep corpus
        # == serial, combined zeroing == separate) that the CPU test
        # suite pins. On TPU the MXU accumulates each output element in a
        # fixed order regardless of the free dim, so the faster fused
        # form is deterministic there.
        t1r = jnp.einsum('ux,...xy->...uy', wr, a, precision=_HI)
        t1i = jnp.einsum('ux,...xy->...uy', wi, a, precision=_HI)
        gr = (jnp.einsum('vy,...uy->...uv', wr, t1r, precision=_HI)
              - jnp.einsum('vy,...uy->...uv', wi, t1i, precision=_HI))
        gi = (jnp.einsum('vy,...uy->...uv', wi, t1r, precision=_HI)
              + jnp.einsum('vy,...uy->...uv', wr, t1i, precision=_HI))
        sq = gr * gr + gi * gi
        return sq.reshape(lead + (64,)) * np.float32(consts.FFT_GLOBAL_MUL)
    a_x = a.reshape(n, 8, 8).transpose(1, 0, 2).reshape(8, n * 8)
    t1r = jnp.matmul(wr, a_x, precision=_HI).reshape(8 * n, 8)
    t1i = jnp.matmul(wi, a_x, precision=_HI).reshape(8 * n, 8)
    gr = (jnp.matmul(t1r, wr.T, precision=_HI)
          - jnp.matmul(t1i, wi.T, precision=_HI))
    gi = (jnp.matmul(t1r, wi.T, precision=_HI)
          + jnp.matmul(t1i, wr.T, precision=_HI))
    sq = gr * gr + gi * gi                       # [u*n, v]
    sq = sq.reshape(8, n, 8).transpose(1, 0, 2)  # [n, u, v]
    return sq.reshape(lead + (64,)) * np.float32(consts.FFT_GLOBAL_MUL)


def _remove_range_around_zero(v, rng):
    """butteraugli.cc:317-326."""
    return jnp.where((v >= -rng) & (v < rng), 0.0,
                     jnp.where(v < 0, v + rng, v - rng))


def block_diff(b0, b1):
    """Batched ButteraugliBlockDiff (butteraugli.cc:602-684).

    Args:
      b0, b1: [..., 3, 64] XYB blocks (row-major y*8+x pixels).
    Returns:
      (diff_dc, diff_ac, diff_edge_dc): each [..., 3].
    """
    csf = jnp.asarray(consts.CSF8X8.astype(np.float32))
    diff = b0 - b1                       # [..., 3, 64]
    d2 = diff.reshape(diff.shape[:-1] + (8, 8))

    # DC: mean over the block, per channel.
    avg = jnp.mean(diff, axis=-1)        # [..., 3]
    dcx, dcy, dcz = xyb_diff_low_freq_squared(
        avg[..., 0], avg[..., 1], avg[..., 2])
    diff_dc = jnp.stack([dcx, dcy, dcz], axis=-1) * csf[0]

    # Edge DC: four edge means (left, top, right, bottom); corners count in
    # both the horizontal and the vertical edge.
    edges = jnp.stack([
        jnp.mean(d2[..., :, 0], axis=-1),   # v_edge x==0
        jnp.mean(d2[..., 0, :], axis=-1),   # h_edge y==0
        jnp.mean(d2[..., :, 7], axis=-1),   # v_edge x==7
        jnp.mean(d2[..., 7, :], axis=-1),   # h_edge y==7
    ], axis=-1)                              # [..., 3, 4]
    ex, ey, ez = xyb_diff_low_freq_squared(
        edges[..., 0, :], edges[..., 1, :], edges[..., 2, :])
    diff_edge = jnp.stack([ex.sum(-1), ey.sum(-1), ez.sum(-1)],
                          axis=-1) * csf[0]

    # AC part via FFTs of (avg y, halfdiff x/y/z), batched into one pass.
    bavg = (b0 + b1) * 0.5
    bhd = (b0 - b1) * 0.5
    lead = bavg.shape[:-2]
    quad = jnp.stack([bavg[..., 1, :], bhd[..., 0, :], bhd[..., 1, :],
                      bhd[..., 2, :]], axis=0).reshape((4,) + lead + (8, 8))
    ffts = fft8x8_squared(quad)
    y_avg, x_hd, y_hd, z_hd = ffts[0], ffts[1], ffts[2], ffts[3]

    sel = slice(4, 37)
    d = csf[sel]
    ac_x = jnp.sum(d * x_hd[..., sel], axis=-1) * np.float32(
        consts.BLOCKDIFF_AC_XMUL)
    ac_z = jnp.sum(d * z_hd[..., sel], axis=-1) * np.float32(
        consts.BLOCKDIFF_AC_ZMUL)

    ya = jnp.sqrt(y_avg[..., sel])
    yh = jnp.sqrt(y_hd[..., sel])
    y0 = _remove_range_around_zero(ya - yh,
                                   np.float32(consts.BLOCKDIFF_Y_LIMIT))
    y1 = _remove_range_around_zero(ya + yh,
                                   np.float32(consts.BLOCKDIFF_Y_LIMIT))
    ymul2 = np.float32(consts.BLOCKDIFF_AC_YMUL2)
    valy0 = color_diff_dy_hf(y0 * ymul2)
    valy1 = color_diff_dy_hf(y1 * ymul2)
    valy = np.float32(consts.BLOCKDIFF_AC_YMUL) * (valy0 - valy1)
    ac_y = jnp.sum(d * valy * valy, axis=-1)

    diff_ac = jnp.stack([ac_x, ac_y, ac_z], axis=-1)
    return diff_dc, diff_ac, diff_edge
