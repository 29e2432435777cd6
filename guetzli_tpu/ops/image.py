"""Device-resident image state ops: integer IDCT, pixel cache, color.

Reference semantics reproduced exactly in int32 (guetzli/idct.cc,
guetzli/output_image.cc, guetzli/color_transform.h):

  * 13-bit fixed-point 8x8 IDCT with libjpeg-compatible rounding;
  * the x16-scaled uint16 pixel cache with parity-dithered rounding
    ``(p + 8 - (x & 1)) >> 4``;
  * integer YCbCr->RGB via the fixed-point tables (evaluated arithmetically
    — verified identical to the reference LUTs in tests).

Everything is batched over blocks; the whole-image path reconstructs all
pixels from coefficients in one shot instead of the reference's incremental
per-block cache updates.
"""

import jax
import jax.numpy as jnp
import numpy as np

from guetzli_tpu import consts

_IDCT = consts.IDCT_MATRIX  # [x, u] int32


def idct_blocks(coeffs):
    """Integer IDCT: [..., 64] int32 -> [..., 64] uint8-range int32.

    Matches ComputeBlockIDCT (idct.cc:139-161): column pass with >>11
    rounding, row pass with (+128 offset) >>18 rounding, clamped to [0,255].
    """
    m = jnp.asarray(_IDCT, dtype=jnp.int32)
    b = coeffs.reshape(coeffs.shape[:-1] + (8, 8)).astype(jnp.int32)
    # Column pass: tmp[y, x] = sum_u M[y, u] * in[u, x].
    col = jnp.einsum('yu,...ux->...yx', m, b,
                     preferred_element_type=jnp.int32)
    col = (col + (1 << 10)) >> 11
    # Row pass: out[y, x] = sum_u M[x, u] * tmp[y, u].
    row = jnp.einsum('xu,...yu->...yx', m, col,
                     preferred_element_type=jnp.int32)
    row = (row + (257 << 17)) >> 18
    out = jnp.clip(row, 0, 255)
    return out.reshape(coeffs.shape)


def blocks_to_plane(blocks, bw, bh, w, h):
    """[..., bh*bw, 64] -> [..., h, w] pixel plane (crop to image size).

    Assembled as 8 per-block-row lane slices stacked on a size-8
    second-minor axis. The naive swapaxes form materializes a
    [..., bh, 8, bw, 8] intermediate whose minor dim 8 is padded to the
    128-lane tile -- 16x the logical bytes, which OOMs HBM at 8+ MPix
    (25.6 GB for a batched 8.3 MPix compare). Here every intermediate
    keeps a >= bw*8 minor dim."""
    lead = blocks.shape[:-2]
    a = blocks.reshape(lead + (bh, bw, 64))
    rows = [a[..., r * 8:(r + 1) * 8].reshape(lead + (bh, bw * 8))
            for r in range(8)]
    img = jnp.stack(rows, axis=-2).reshape(lead + (bh * 8, bw * 8))
    return img[..., :h, :w]


def pixels_to_srgb(yuv_planes, w):
    """Rounded pixel cache -> interleaved YCbCr bytes -> RGB (int).

    ``yuv_planes``: [3, H, W] int32 pixel values scaled x16 (the pixel
    cache). Applies ToPixels' parity dither (output_image.cc:83) and the
    integer YCbCr->RGB transform. Returns [3, H, W] int32 in 0..255.
    """
    x = jnp.arange(yuv_planes.shape[-1], dtype=jnp.int32)
    dither = 8 - (x & 1)
    px = (yuv_planes + dither[None, None, :]) >> 4
    return ycbcr_to_rgb(px[0], px[1], px[2])


def ycbcr_to_rgb(y, cb, cr):
    """color_transform.h:1038-1046, arithmetic form of the tables."""
    cr_off = cr - 128
    cb_off = cb - 128
    r = y + ((91881 * cr_off + 32768) >> 16)
    b = y + ((116130 * cb_off + 32768) >> 16)
    g = y + (((-46802) * cr_off + (-22554) * cb_off + 32768) >> 16)
    out = jnp.stack([r, g, b])
    return jnp.clip(out, 0, 255)


def srgb_to_linear(rgb_int):
    """uint8-range ints -> linear float (gamma_correct.cc:23-33).

    Default: the arithmetic form of the 256-entry LUT -- the linear
    segment below 11 and the 2.4-power above, ~6 vector ops per element
    (the power is one VPU transcendental), within ~1e-6 relative of the
    float64-built table. GUETZLI_TPU_EXACT_LUT=1 restores the exact
    factored one-hot table read (a [N, 16] x [16, 16] contraction --
    gathers would serialize on the TPU scalar core)."""
    from guetzli_tpu import config
    ix = rgb_int.astype(jnp.int32)
    if not config.current().exact_lut:
        vf = ix.astype(jnp.float32)
        lo = vf * np.float32(1.0 / 12.92)
        hi = np.float32(255.0) * (
            (vf * np.float32(1.0 / 255.0) + np.float32(0.055))
            * np.float32(1.0 / 1.055)) ** np.float32(2.4)
        return jnp.where(ix < 11, lo, hi)
    lut = jnp.asarray(consts.SRGB_TO_LINEAR.astype(np.float32)
                      .reshape(16, 16))
    i16 = jnp.arange(16, dtype=jnp.int32)
    oh_hi = (jnp.right_shift(ix, 4)[..., None] == i16).astype(jnp.float32)
    sub = jnp.einsum('...a,ab->...b', oh_hi, lut,
                     precision=jax.lax.Precision.HIGHEST)
    oh_lo = ((ix & 15)[..., None] == i16).astype(jnp.float32)
    return jnp.sum(oh_lo * sub, axis=-1)


def byte_plane(pix_x16, w):
    """x16 pixel plane [..., H, W] -> bytes via the ToPixels parity dither
    (output_image.cc:83)."""
    x = jnp.arange(pix_x16.shape[-1], dtype=jnp.int32)
    return (pix_x16 + (8 - (x & 1))[None, :]) >> 4


def chroma_byte_plane(coeffs, bw, bh, w, h):
    """Factor-2 chroma component [NB, 64] -> full-res bytes [h, w]:
    IDCT -> x16 subsampled plane -> fancy upsample -> dither."""
    from guetzli_tpu.ops import upsample as us
    ws, hs = (w + 1) // 2, (h + 1) // 2
    vals = idct_blocks(coeffs)
    sub = blocks_to_plane(vals << 4, bw, bh, ws, hs)
    full = us.fancy_upsample(sub, w, h)
    return byte_plane(full, w)


def chroma_byte_plane_dyn(coeffs, cbwp, cbhp, wp, hp, w, h):
    """Padded-bucket factor-2 chroma bytes: [NBCp, 64] -> [hp, wp], with
    the true size (w, h) traced (upsample border clamps are dynamic)."""
    from guetzli_tpu.ops import upsample as us
    ws = (w + 1) // 2
    hs = (h + 1) // 2
    vals = idct_blocks(coeffs)
    sub = blocks_to_plane(vals << 4, cbwp, cbhp, wp // 2, hp // 2)
    full = us.fancy_upsample_dyn(sub, ws, hs)
    return byte_plane(full, wp)


def coeffs420_to_srgb_dyn(y_coeffs, u_coeffs, v_coeffs, ybwp, ybhp,
                          cbwp, cbhp, wp, hp, w, h):
    """Padded-bucket YUV420 -> [3, hp, wp] int32 sRGB bytes (garbage
    outside the valid region)."""
    ypix = blocks_to_plane(idct_blocks(y_coeffs) << 4, ybwp, ybhp, wp, hp)
    yb = byte_plane(ypix, wp)
    ub = chroma_byte_plane_dyn(u_coeffs, cbwp, cbhp, wp, hp, w, h)
    vb = chroma_byte_plane_dyn(v_coeffs, cbwp, cbhp, wp, hp, w, h)
    return ycbcr_to_rgb(yb, ub, vb)


def coeffs420_to_srgb(y_coeffs, u_coeffs, v_coeffs, ybw, ybh, cbw, cbh,
                      w, h):
    """YUV420 state -> [3, H, W] int32 sRGB bytes (OutputImage::ToSRGB with
    factor-2 chroma)."""
    ypix = blocks_to_plane(idct_blocks(y_coeffs) << 4, ybw, ybh, w, h)
    yb = byte_plane(ypix, w)
    ub = chroma_byte_plane(u_coeffs, cbw, cbh, w, h)
    vb = chroma_byte_plane(v_coeffs, cbw, cbh, w, h)
    return ycbcr_to_rgb(yb, ub, vb)


def coeffs_to_srgb(coeffs, bw, bh, w, h):
    """[3, NB, 64] int32 dequantized YUV444 coefficients -> [3, H, W] int32
    sRGB bytes (OutputImage::ToSRGB, output_image.cc:654-701)."""
    pix = idct_blocks(coeffs) << 4        # pixel cache is scaled x16
    planes = blocks_to_plane(pix, bw, bh, w, h)
    return pixels_to_srgb(planes, w)


def coeffs_to_linear_rgb(coeffs, bw, bh, w, h):
    """[3, NB, 64] int32 dequantized coefficients -> [3, H, W] linear RGB.

    The full OutputImage::ToLinearRGB path for a YUV444 image: integer IDCT,
    pixel cache semantics, YCbCr->RGB, sRGB->linear.
    """
    return srgb_to_linear(coeffs_to_srgb(coeffs, bw, bh, w, h))


def quantize_coeffs(coeffs, quant):
    """Round to nearest multiple of quant (quantize.h:548-553).

    coeffs: [..., 64] int32; quant broadcastable int32.
    """
    c = coeffs.astype(jnp.int32)
    q = quant.astype(jnp.int32)
    # C's % truncates toward zero.
    r = jnp.sign(c) * (jnp.abs(c) % q)
    delta = jnp.where(2 * r > q, q - r,
                      jnp.where(-2 * r > q, -q - r, -r))
    return c + delta
