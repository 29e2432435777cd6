"""Per-8x8-tile comparison pipeline, batched over all DCT blocks.

This is the TPU equivalent of the reference's per-block hot path
(butteraugli_comparator.cc:113-163 `CompareBlock` and the GPU zeroing
kernel's on-device reconstruction, clguetzli.cl:3288-3339): candidate
coefficients -> integer IDCT -> sRGB bytes (with the image-edge replication
of OutputImageComponent::ToPixels, output_image.cc:68-98) -> linear RGB ->
8x8 opsin -> MaskHighIntensityChange confined to the tile -> butteraugli
block diff -> masked scalar error. Everything is batched over a leading
block axis; there is no per-block control flow.
"""

import jax
import jax.numpy as jnp
import numpy as np

from functools import partial

from guetzli_tpu import consts
from guetzli_tpu.ops import blockdiff as bd
from guetzli_tpu.ops import image as img_ops
from guetzli_tpu.ops.opsin import opsin_dynamics_blocks

_BLOCK_EDGE_W = np.float32(consts.BLOCK_EDGE_WEIGHT)


def _tile_border_masks():
    """Validity masks for the four 1-pixel shifts inside an 8x8 tile."""
    ones = np.ones((8, 8), dtype=bool)
    left = ones.copy(); left[:, 0] = False     # neighbor at x-1
    right = ones.copy(); right[:, -1] = False  # neighbor at x+1
    up = ones.copy(); up[0, :] = False
    down = ones.copy(); down[-1, :] = False
    return left, right, up, down


_M_LEFT, _M_RIGHT, _M_UP, _M_DOWN = _tile_border_masks()


def mask_high_intensity_change_tiles(t0, t1):
    """MaskHighIntensityChange on [..., 3, 8, 8] tiles (butteraugli.cc:791).

    The reference calls _MaskHighIntensityChange with xsize=ysize=8 from
    CompareBlock, so neighbor visibility stops at the tile border.
    """
    ave = (t0 + t1) * 0.5
    y = ave[..., 1, :, :]
    big = jnp.float32(-1.0)

    def sq_shift(dy, dx, valid):
        shifted = jnp.roll(jnp.roll(y, -dy, axis=-2), -dx, axis=-1)
        d = shifted - y
        return jnp.where(jnp.asarray(valid), d * d, big)

    sqr_max = jnp.maximum(
        jnp.maximum(sq_shift(0, -1, _M_LEFT), sq_shift(0, 1, _M_RIGHT)),
        jnp.maximum(sq_shift(-1, 0, _M_UP), sq_shift(1, 0, _M_DOWN)))

    red = consts.MHIC_REDUCTION.astype(np.float32)
    chroma = np.float32(consts.MHIC_CHROMA_BALANCE)
    chroma_scale = chroma / (y + chroma)
    mix = jnp.stack([
        chroma_scale * np.float32(red[0]) / (sqr_max + np.float32(red[0])),
        np.float32(red[1]) / (sqr_max + np.float32(red[1])),
        chroma_scale * np.float32(red[2]) / (sqr_max + np.float32(red[2])),
    ], axis=-3)
    out0 = mix * t0 + (1.0 - mix) * ave
    out1 = mix * t1 + (1.0 - mix) * ave
    return out0, out1


def edge_replicate(v, ysel, xsel):
    """Right/bottom image-edge byte replication of ToPixels
    (output_image.cc:86-97) without gathers: the per-tile clamped index
    vectors encode a single (ymax, xmax) clamp, so the replication is one
    one-hot contraction (the edge row/column) plus a lane select. Gathers
    serialize on the TPU scalar core; this form stays on the VPU/MXU.

    Args:
      v: [..., 8, 8] integer-valued tiles (any leading dims).
      ysel, xsel: [...sel, 8] int32 clamped index vectors (min(i, max));
        their leading dims are v's leading dims minus any channel-like
        axes between them and the trailing [8, 8] (broadcast over those).
    """
    extra = v.ndim - ysel.ndim - 1          # channel-like axes to broadcast
    f = v.astype(jnp.float32)
    iy = jnp.arange(8, dtype=jnp.int32)
    ymax = ysel[..., 7]
    xmax = xsel[..., 7]
    oh_y = (iy == ymax[..., None]).astype(jnp.float32)      # [...sel, 8]
    oh_x = (iy == xmax[..., None]).astype(jnp.float32)
    my = iy <= ymax[..., None]                              # [...sel, 8]
    mx = iy <= xmax[..., None]
    for _ in range(extra):
        oh_y = oh_y[..., None, :]
        oh_x = oh_x[..., None, :]
        my = my[..., None, :]
        mx = mx[..., None, :]
    row = jnp.sum(oh_y[..., :, None] * f, axis=-2)          # [..., 8] over x
    f = jnp.where(my[..., :, None], f, row[..., None, :])
    col = jnp.sum(oh_x[..., None, :] * f, axis=-1)          # [..., 8] over y
    f = jnp.where(mx[..., None, :], f, col[..., None])
    return f.astype(v.dtype)


def tiles_to_linear_rgb(coeff_tiles, xsel, ysel):
    """Dequantized coefficient tiles -> linear RGB tiles.

    Args:
      coeff_tiles: [..., 3, 64] int32 (dequantized, YCbCr).
      xsel, ysel:  [..., 8] int32 per-tile pixel gather indices implementing
        the right/bottom image-edge byte replication of ToPixels
        (output_image.cc:86-97): identity for interior tiles, clamped to the
        last in-image column/row for edge tiles.
    Returns:
      [..., 3, 8, 8] float32 linear RGB.
    """
    v = img_ops.idct_blocks(coeff_tiles)            # [..., 3, 64] in 0..255
    v = v.reshape(v.shape[:-1] + (8, 8))
    # For factor-1 components the x16 pixel cache + parity dither round-trips
    # to the IDCT bytes exactly ((16*v + 8 - (x&1)) >> 4 == v), so the bytes
    # are the IDCT values; only the edge replication needs modeling.
    v = edge_replicate(v, ysel, xsel)
    rgb = img_ops.ycbcr_to_rgb(v[..., 0, :, :], v[..., 1, :, :],
                               v[..., 2, :, :])     # stacks on axis 0
    rgb = jnp.moveaxis(rgb, 0, -3)                  # [..., 3, 8, 8]
    return img_ops.srgb_to_linear(rgb)


def compare_blocks(xyb0_tiles, cand_lin, scale):
    """Batched ButteraugliComparator::CompareBlock core.

    Args:
      xyb0_tiles: [..., 3, 64] opsin tiles of the original image
        (per-block opsin, clamped-edge sampling -- SwitchBlock semantics).
        Stored flat: a [..., 8, 8] device array pads its minor dim to the
        128-lane tile (16x the bytes); the flat form is reshaped here
        inside the fusion instead.
      cand_lin:   [..., 3, 8, 8] linear RGB of the candidate reconstruction.
      scale:      [..., 3] whole-image mask values at the block's top-left
        pixel (butteraugli_comparator.cc:148-151).
    Returns:
      [...] float32 block errors.
    """
    xyb0 = xyb0_tiles.reshape(xyb0_tiles.shape[:-1] + (8, 8))
    xyb1 = opsin_dynamics_blocks(cand_lin)
    m0, m1 = mask_high_intensity_change_tiles(xyb0, xyb1)
    flat0 = m0.reshape(m0.shape[:-2] + (64,))
    flat1 = m1.reshape(m1.shape[:-2] + (64,))
    dc, ac, edge = bd.block_diff(flat0, flat1)
    diff = jnp.sum((dc + ac) * scale, axis=-1)
    diff_edge = jnp.sum(edge * scale, axis=-1)
    return jnp.sqrt((1.0 - _BLOCK_EDGE_W) * diff + _BLOCK_EDGE_W * diff_edge)


def edge_gather_indices(bw, bh, w, h):
    """Per-block (ysel, xsel) int32 arrays [bh*bw, 8] for edge replication."""
    bx = np.tile(np.arange(bw, dtype=np.int32), bh)
    by = np.repeat(np.arange(bh, dtype=np.int32), bw)
    ix = np.arange(8, dtype=np.int32)
    xmax = np.minimum(7, (w - 1) - 8 * bx)
    ymax = np.minimum(7, (h - 1) - 8 * by)
    xsel = np.minimum(ix[None, :], xmax[:, None])
    ysel = np.minimum(ix[None, :], ymax[:, None])
    return ysel, xsel


def compare_blocks_420y(cand_y, chroma_bytes, xyb0_tiles, scales,
                        ysel, xsel):
    """420 Y-pass CompareBlock: candidate Y tiles against frozen upsampled
    chroma bytes (the chroma planes don't change while comp_mask==1).

    cand_y: [NB, 64] int32; chroma_bytes: [NB, 2, 8, 8] int32 (already
    edge-replicated); rest as compare_blocks.
    """
    yv = img_ops.idct_blocks(cand_y).reshape(cand_y.shape[:-1] + (8, 8))
    yv = edge_replicate(yv, ysel, xsel)
    rgb = img_ops.ycbcr_to_rgb(yv, chroma_bytes[:, 0], chroma_bytes[:, 1])
    lin = img_ops.srgb_to_linear(jnp.moveaxis(rgb, 0, -3))
    return compare_blocks(xyb0_tiles, lin, scales)


def compare_blocks_420c(cand_u, cand_v, neigh_u, neigh_v, y_bytes16,
                        xyb0_sub, scales_sub, ysel_sub, xsel_sub,
                        valid_sub):
    """420 chroma-pass CompareBlock over 16x16 macroblocks.

    Mirrors the GPU kernel's CompareBlockFactor (clguetzli.cl:3440-3639):
    rebuild the candidate chroma 16x16 area by fancy-upsampling the 10x10
    subsampled neighborhood (neighbors frozen at pass start -- the serial
    reference restores every block after processing it, so neighbors always
    hold pre-pass state), then evaluate the 2x2 grid of full-res 8x8
    sub-blocks against the original and take the max error.

    Args:
      cand_u/cand_v: [NBc, 64] int32 candidate chroma coefficients.
      neigh_u/neigh_v: [NBc, 10, 10] int32 frozen x16 subsampled planes.
      y_bytes16: [NBc, 16, 16] int32 frozen Y bytes (edge-replicated per
        sub-block).
      xyb0_sub: [NBc, 2, 2, 3, 8, 8] original opsin tiles of the children.
      scales_sub: [NBc, 2, 2, 3]; ysel_sub/xsel_sub: [NBc, 2, 2, 8];
      valid_sub: [NBc, 2, 2] bool (sub-block inside the image).
    Returns: [NBc] max block errors.
    """
    from guetzli_tpu.ops import upsample as us

    def chroma16(cand, neigh):
        v = img_ops.idct_blocks(cand).reshape(cand.shape[:-1] + (8, 8))
        filled = neigh.at[..., 1:9, 1:9].set(v << 4)
        return us.upsample_16x16_from_neighborhood(filled)   # x16 pixels

    u16 = chroma16(cand_u, neigh_u)
    v16 = chroma16(cand_v, neigh_v)
    # ToPixels dither: x = 16*bx + ix, so parity is ix&1.
    dith = 8 - (jnp.arange(16) & 1)
    ub = (u16 + dith[None, None, :]) >> 4
    vb = (v16 + dith[None, None, :]) >> 4

    def split(p):
        # [NBc, 16, 16] -> [NBc, 2, 2, 8, 8]
        n = p.shape[0]
        return p.reshape(n, 2, 8, 2, 8).transpose(0, 1, 3, 2, 4)

    ys, us_, vs = split(y_bytes16), split(ub), split(vb)
    # Per-sub-block edge replication (ToPixels copies the last in-image
    # byte), via clamped gathers.
    def rep(p):
        return edge_replicate(p, ysel_sub, xsel_sub)

    rgb = img_ops.ycbcr_to_rgb(rep(ys), rep(us_), rep(vs))
    lin = img_ops.srgb_to_linear(jnp.moveaxis(rgb, 0, -3))
    errs = compare_blocks(xyb0_sub, lin, scales_sub)    # [NBc, 2, 2]
    errs = jnp.where(valid_sub, errs, 0.0)   # max_err starts at 0
    return jnp.max(errs, axis=(1, 2))


def original_opsin_tiles(rgb, w, h, bw, bh):
    """Per-block opsin of the original sRGB image (SwitchBlock,
    butteraugli_comparator.cc:85-111): pixels sampled with coordinates
    clamped to the image, then an 8x8-confined opsin transform.

    The uint8 image ships to the device and the sRGB->linear table
    lookup, clamped sampling, and tiling all run there (bit-identical to
    the host form: same table, same gather) -- the host path uploaded
    the expanded [NB, 3, 8, 8] float tiles instead, 16x the bytes over
    the ~50 MB/s link (~2 s of the 8 MPix zeroing_aux wall).

    Args:
      rgb: uint8 [h, w, 3].
    Returns:
      [bh*bw, 3, 64] float32 opsin tiles, stored flat (numpy in, jax out).
    """
    lut = consts.SRGB_TO_LINEAR.astype(np.float32)
    xs = np.minimum(np.arange(bw * 8), w - 1).astype(np.int32)
    ys = np.minimum(np.arange(bh * 8), h - 1).astype(np.int32)
    return _original_opsin_tiles_dev(
        np.ascontiguousarray(rgb, dtype=np.uint8), jnp.asarray(lut),
        ys, xs, bw=bw, bh=bh)


@partial(jax.jit, static_argnames=("bw", "bh"))
def _original_opsin_tiles_dev(rgb_u8, lut, ys, xs, bw, bh):
    lin = lut[rgb_u8[ys][:, xs]]                        # [8bh, 8bw, 3]
    tiles = (lin.reshape(bh, 8, bw, 8, 3)
             .transpose(0, 2, 4, 1, 3)
             .reshape(bh * bw, 3, 8, 8))
    return opsin_dynamics_blocks(tiles).reshape(bh * bw, 3, 64)
