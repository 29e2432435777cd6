"""Fancy (libjpeg 3x3 triangle) chroma upsampling for YUV420.

Reference semantics: OutputImageComponent::UpdatePixelsForBlock
(output_image.cc:147-204) maintains a full-resolution x16 pixel cache for
factor-2 components by locally upsampling a 10x10 subsampled neighborhood
around each changed block. Here the cache is instead rematerialized from
the full subsampled plane in one batched gather -- identical except at
block seams, where the reference's incremental inverse-upsampler
reconstruction (output_image.cc:174-182) can differ by a few units of the
x16 scale (sub-1/8-pixel; bytes after the >>4 dither almost never change).
"""

import jax
import jax.numpy as jnp
import numpy as np


def subsampled_plane(idct_vals, bw, bh, ws, hs):
    """[NB, 64] int32 IDCT bytes -> x16 subsampled plane [hs, ws]."""
    from guetzli_tpu.ops.image import blocks_to_plane
    return blocks_to_plane(idct_vals << 4, bw, bh, ws, hs)


def fancy_upsample(sub, w, h):
    """x16 subsampled plane [hs, ws] -> full-res x16 pixels [h, w].

    out[y,x] = (9*s[cy,cx] + 3*s[cy2,cx] + 3*s[cy,cx2] + s[cy2,cx2]) >> 4
    with (cx, cy) = (x>>1, y>>1) and cx2/cy2 the parity-directed neighbor,
    clamped at the image border (the kSubsampledEdgeSize edge fill).
    """
    hs, ws = sub.shape
    x = jnp.arange(w)
    y = jnp.arange(h)
    cx = x >> 1
    cy = y >> 1
    dx = (x & 1) * 2 - 1
    dy = (y & 1) * 2 - 1
    cx2 = jnp.clip(cx + dx, 0, ws - 1)
    cy2 = jnp.clip(cy + dy, 0, hs - 1)
    s00 = sub[cy][:, cx]
    s01 = sub[cy][:, cx2]
    s10 = sub[cy2][:, cx]
    s11 = sub[cy2][:, cx2]
    return (9 * s00 + 3 * s01 + 3 * s10 + s11) >> 4


def fancy_upsample_dyn(sub, ws, hs):
    """Padded-bucket fancy upsample: sub [hsp, wsp] with the true
    subsampled extent (ws, hs) as traced scalars -> [2*hsp, 2*wsp] x16
    pixels (garbage outside the valid full-res region)."""
    hsp, wsp = sub.shape
    x = jnp.arange(2 * wsp)
    y = jnp.arange(2 * hsp)
    cx = x >> 1
    cy = y >> 1
    dx = (x & 1) * 2 - 1
    dy = (y & 1) * 2 - 1
    cx2 = jnp.clip(cx + dx, 0, ws - 1)
    cy2 = jnp.clip(cy + dy, 0, hs - 1)
    s00 = sub[cy][:, cx]
    s01 = sub[cy][:, cx2]
    s10 = sub[cy2][:, cx]
    s11 = sub[cy2][:, cx2]
    return (9 * s00 + 3 * s01 + 3 * s10 + s11) >> 4


def neighborhoods_10x10(sub, bw, bh):
    """Per-block 10x10 subsampled neighborhoods [NB, 10, 10] (clamped).

    Layout matches the kernel's CompareBlockFactor reconstruction
    (clguetzli.cl:3440-3639): rows/cols -1..8 of each 8x8 block, border
    entries clamped to the plane.
    """
    hs, ws = sub.shape
    bx = np.tile(np.arange(bw), bh)
    by = np.repeat(np.arange(bh), bw)
    ix = np.arange(-1, 9)
    gx = np.clip(bx[:, None] * 8 + ix[None, :], 0, ws - 1)   # [NB, 10]
    gy = np.clip(by[:, None] * 8 + ix[None, :], 0, hs - 1)
    return sub[gy[:, :, None], gx[:, None, :]]


def upsample_16x16_from_neighborhood(neigh):
    """[..., 10, 10] x16 subsampled neighborhoods -> [..., 16, 16] x16
    full-res pixels of the block's own 16x16 area."""
    x = jnp.arange(16)
    cx = (x >> 1) + 1           # index into the 10-wide neighborhood
    dx = (x & 1) * 2 - 1
    cx2 = cx + dx               # in [0, 9]
    s00 = neigh[..., cx, :][..., :, cx]
    s01 = neigh[..., cx, :][..., :, cx2]
    s10 = neigh[..., cx2, :][..., :, cx]
    s11 = neigh[..., cx2, :][..., :, cx2]
    return (9 * s00 + 3 * s01 + 3 * s10 + s11) >> 4
