"""Gaussian blur with Guetzli/butteraugli semantics, as XLA convolutions.

Reproduces the reference blur (butteraugli.cc:68-148) including its two
quirks, which materially affect output parity:

  * border reweighting: each output position is divided by the sum of the
    kernel taps that actually overlapped the image, linearly mixed with the
    full-kernel weight by ``border_ratio``;
  * step subsampling: for sigma >= 3 the convolution is evaluated only at
    every ``int(sigma/3)``-th position in both dimensions and the result is
    nearest-neighbor upsampled back.

All convolutions are expressed as ``lax.conv_general_dilated`` so XLA can
fuse and tile them for the VPU/MXU; there is no Python-level looping.
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@lru_cache(maxsize=None)
def gauss_taps(sigma: float):
    """Kernel taps as float32 (reference stores the kernel as float)."""
    m = 2.25
    diff = max(1, int(m * abs(sigma)))
    scaler = -1.0 / (2.0 * sigma * sigma)
    i = np.arange(-diff, diff + 1, dtype=np.float64)
    taps = np.exp(scaler * i * i).astype(np.float32)
    return taps, diff


def _conv1d_strided(x, taps, offset, step):
    """Correlate rows of ``x`` [R, C] with ``taps`` at positions 0, step, ...

    Out-of-image taps contribute zero (handled by zero padding); returns
    [R, ceil(C / step)].
    """
    k = taps.shape[0]
    lhs = x[:, None, :]                      # [R, 1, C]
    rhs = taps[None, None, :]                # [O=1, I=1, K]
    out = lax.conv_general_dilated(
        lhs, rhs,
        window_strides=(step,),
        padding=[(offset, k - 1 - offset)],
        dimension_numbers=('NCH', 'OIH', 'NCH'),
        precision=lax.Precision.HIGHEST,
    )
    return out[:, 0, :]


@lru_cache(maxsize=None)
def _border_weights(size: int, taps_key, offset: int, step: int,
                    border_ratio: float):
    """Per-output-position normalization (butteraugli.cc:76-89)."""
    taps = np.asarray(taps_key, dtype=np.float64)
    full = taps[:2 * offset + 1].sum()
    n_out = -(-size // step)
    w = np.zeros(n_out, dtype=np.float64)
    for ox in range(n_out):
        x = ox * step
        lo = max(0, x - offset)
        hi = min(size, x + len(taps) - offset) - 1
        w[ox] = taps[lo - x + offset:hi - x + offset + 1].sum()
    w = (1.0 - border_ratio) * w + border_ratio * full
    return (1.0 / w).astype(np.float32)


def blur(channel, sigma: float, border_ratio: float = 0.0):
    """Blur an image [..., H, W] (leading axes batched in one conv).

    Mirrors _Blur (butteraugli.cc:100-148): horizontal pass (with stride),
    vertical pass on the subsampled intermediate, then nearest upsample.
    """
    lead = channel.shape[:-2]
    h, w = channel.shape[-2:]
    taps, offset = gauss_taps(sigma)
    step = max(1, int(sigma / 3.0))
    taps_key = tuple(taps.tolist())
    jt = jnp.asarray(taps)

    scale_x = jnp.asarray(
        _border_weights(w, taps_key, offset, step, border_ratio))
    scale_y = jnp.asarray(
        _border_weights(h, taps_key, offset, step, border_ratio))

    # Horizontal: [..., H, W] -> [..., H, dW], normalized per column.
    t = _conv1d_strided(channel.reshape(-1, w), jt, offset, step)
    dw = t.shape[-1]
    t = t * scale_x[None, :]
    # Vertical over the intermediate: conv the H axis.
    t = t.reshape(lead + (h, dw))
    t = jnp.swapaxes(t, -1, -2)                      # [..., dW, H]
    t = _conv1d_strided(t.reshape(-1, h), jt, offset, step)
    t = t * scale_y[None, :]
    dh = t.shape[-1]
    out = jnp.swapaxes(t.reshape(lead + (dw, dh)), -1, -2)

    if step > 1:
        out = _nearest_upsample(out, step, h, w)
    return out


def blur_step(sigma: float) -> int:
    return max(1, int(sigma / 3.0))


@lru_cache(maxsize=None)
def _upsample_matrix(dw: int, w: int, step: int):
    """[dw, w] 0/1 matrix: column j reads subsampled position j // step."""
    u = np.zeros((dw, w), dtype=np.float32)
    u[np.minimum(np.arange(w) // step, dw - 1), np.arange(w)] = 1.0
    return u


def _nearest_upsample(out, step, h, w):
    """Nearest-neighbor upsample [..., dh, dw] -> [..., h, w].

    The row pass is a repeat (its [..., dh, step, dw] intermediate keeps
    the minor dim wide). The column pass differs per backend: a repeat on
    the minor axis materializes a [..., dw, step] tensor whose minor dim
    `step` the TPU T(8,128) layout pads to 128 lanes -- 32x the logical
    bytes at step 4, a multi-GB transient per plane-scale blur (the
    round-2 mpix1 OOM class) -- so accelerators use an exact one-hot
    matmul instead (one 1.0 * value product per output)."""
    from guetzli_tpu.ops.layout import lane_safe
    t = jnp.repeat(out, step, axis=-2)[..., :h, :]
    if not lane_safe():
        return jnp.repeat(t, step, axis=-1)[..., :w]
    u = jnp.asarray(_upsample_matrix(t.shape[-1], w, step))
    return jnp.einsum('...d,dw->...w', t, u,
                      precision=lax.Precision.HIGHEST)


def border_scales(size: int, padded: int, sigma: float,
                  border_ratio: float = 0.0):
    """Host-side border scales for a *padded* axis: the per-position
    normalization for actual extent ``size`` laid into a
    ``ceil(padded/step)``-long array (entries past the valid strided
    positions are 1.0 and must be masked downstream).

    This is what lets one compiled program serve every image size in a
    shape bucket: positions and masks are computed in-graph from dynamic
    (w, h) scalars, while these precision-critical float64 weights stay
    host-computed exactly as in the static path (butteraugli.cc:76-89)."""
    taps, offset = gauss_taps(sigma)
    step = blur_step(sigma)
    real = _border_weights(size, tuple(taps.tolist()), offset, step,
                           border_ratio)
    n_out = -(-padded // step)
    out = np.ones(n_out, dtype=np.float32)
    out[:len(real)] = real[:n_out]
    return out


def blur_dyn(channel, sigma: float, scale_x, scale_y):
    """Blur [..., Hp, Wp] with host-supplied border scales (padded mode).

    The caller must pre-mask the input to zero outside the valid region;
    combined with the actual-extent ``scale_x``/``scale_y`` this reproduces
    the reference's border reweighting exactly at every valid pixel, while
    the program shape depends only on the padded (bucket) dimensions."""
    lead = channel.shape[:-2]
    h, w = channel.shape[-2:]
    taps, offset = gauss_taps(sigma)
    step = blur_step(sigma)
    jt = jnp.asarray(taps)

    t = _conv1d_strided(channel.reshape(-1, w), jt, offset, step)
    dw = t.shape[-1]
    t = t * scale_x[None, :]
    t = t.reshape(lead + (h, dw))
    t = jnp.swapaxes(t, -1, -2)
    t = _conv1d_strided(t.reshape(-1, h), jt, offset, step)
    t = t * scale_y[None, :]
    dh = t.shape[-1]
    out = jnp.swapaxes(t.reshape(lead + (dw, dh)), -1, -2)

    if step > 1:
        out = _nearest_upsample(out, step, h, w)
    return out


def blur_planes(planes, sigma: float, border_ratio: float = 0.0):
    """Blur each channel of a planar [C, H, W] image (one batched conv)."""
    return blur(planes, sigma, border_ratio)


@lru_cache(maxsize=None)
def blur_matrix(size: int, sigma: float, border_ratio: float = 0.0):
    """Dense [size, size] matrix B with (B @ v) == blur(v) for step==1.

    Used for small tiles (e.g. the 8x8 per-block opsin blur) where two tiny
    matmuls on the MXU beat a convolution.
    """
    taps, offset = gauss_taps(sigma)
    taps64 = taps.astype(np.float64)
    assert max(1, int(sigma / 3.0)) == 1
    full = taps64.sum()
    mat = np.zeros((size, size), dtype=np.float64)
    for x in range(size):
        lo = max(0, x - offset)
        hi = min(size, x + len(taps) - offset) - 1
        for j in range(lo, hi + 1):
            mat[x, j] = taps64[j - x + offset]
        wsum = mat[x].sum()
        wsum = (1.0 - border_ratio) * wsum + border_ratio * full
        mat[x] /= wsum
    return mat.astype(np.float32)
