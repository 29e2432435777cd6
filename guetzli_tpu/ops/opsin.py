"""sRGB-linear -> XYB opsin dynamics transform (butteraugli.cc:741-974).

The transform is: blur the linear RGB with sigma=1.1, compute a per-pixel
sensitivity from the blurred image through the opsin absorbance mixing and a
rational-polynomial gamma, apply the sensitivity to the absorbance of the
sharp image, and mix into the XYB opponent space. Pure elementwise math plus
one small blur — XLA fuses the whole thing into a couple of kernels.
"""

import jax
import jax.numpy as jnp
import numpy as np

from guetzli_tpu import consts
from guetzli_tpu.ops.blur import blur, blur_matrix


def _clenshaw(x, coeffs):
    """Chebyshev-basis polynomial evaluation (butteraugli.cc:869-896)."""
    b1 = jnp.zeros_like(x)
    b2 = jnp.zeros_like(x)
    for c in coeffs[:0:-1]:
        t = (x * b1) * 2.0 - b2 + np.float32(c)
        b2 = b1
        b1 = t
    return x * b1 - b2 + np.float32(coeffs[0])


def gamma(v):
    """Rational polynomial gamma (butteraugli.cc:923-941)."""
    x01 = (v - np.float32(consts.GAMMA_MIN_VALUE)) / np.float32(
        consts.GAMMA_MAX_VALUE - consts.GAMMA_MIN_VALUE)
    xc = 2.0 * x01 - 1.0
    yp = _clenshaw(xc, consts.GAMMA_P)
    yq = _clenshaw(xc, consts.GAMMA_Q)
    return yp / yq


def opsin_absorbance(rgb):
    """[..., 3, H, W] linear RGB -> absorbance (butteraugli.cc:759-764)."""
    m = jnp.asarray(consts.OPSIN_MIX, dtype=jnp.float32)
    b = jnp.asarray(consts.OPSIN_BIAS, dtype=jnp.float32)
    return (jnp.einsum('ck,...khw->...chw', m, rgb,
                       precision=jax.lax.Precision.HIGHEST)
            + b[..., :, None, None])


def rgb_to_xyb(mixed):
    """Opponent mixing (butteraugli.cc:283-292)."""
    m = jnp.asarray(consts.RGB_TO_XYB, dtype=jnp.float32)
    return jnp.einsum('ck,...khw->...chw', m, mixed,
                      precision=jax.lax.Precision.HIGHEST)


def opsin_dynamics_image(rgb):
    """[3, H, W] linear RGB -> XYB opsin (butteraugli.cc:943-974)."""
    blurred = blur(rgb, consts.OPSIN_SIGMA, 0.0)
    return _opsin_from_blurred(rgb, blurred)


def opsin_dynamics_image_dyn(rgb, w, h, sc):
    """Padded-bucket opsin: [3, Hp, Wp] linear RGB with true size (w, h)
    as traced scalars; `sc` holds the host-computed "opsin" blur border
    scales (ops/padgeom.py). Values outside the valid region are garbage
    and must be masked by consumers."""
    hp, wp = rgb.shape[-2:]
    row = jnp.arange(hp, dtype=jnp.int32)[:, None]
    col = jnp.arange(wp, dtype=jnp.int32)[None, :]
    vm = (row < h) & (col < w)
    from guetzli_tpu.ops.blur import blur_dyn
    blurred = blur_dyn(rgb * vm[None], consts.OPSIN_SIGMA, *sc["opsin"])
    return _opsin_from_blurred(rgb, blurred)


def opsin_dynamics_blocks(rgb_blocks):
    """Per-tile opsin for [..., 3, 8, 8] tiles (blur stays inside the tile).

    This is the SwitchBlock/per-block-opsin path of the reference
    (butteraugli_comparator.cc:85-111): OpsinDynamicsImage called with
    xsize=ysize=8, so the sigma=1.1 blur sees only the tile. The blur is two
    8x8 matmuls here (MXU-friendly for large block batches).
    """
    bm = jnp.asarray(blur_matrix(8, consts.OPSIN_SIGMA, 0.0))
    blurred = jnp.einsum('ij,...jk,lk->...il', bm, rgb_blocks, bm,
                         precision=jax.lax.Precision.HIGHEST)
    return _opsin_from_blurred(rgb_blocks, blurred)


def _opsin_from_blurred(rgb, blurred):
    pre_mixed = opsin_absorbance(blurred)
    sensitivity = gamma(pre_mixed) / pre_mixed
    cur_mixed = opsin_absorbance(rgb) * sensitivity
    return rgb_to_xyb(cur_mixed)
