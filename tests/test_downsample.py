"""YUV420 downsampling-path unit tests."""

import numpy as np
import pytest

from guetzli_tpu.codec.dct_double import block_dct_double, block_idct_double
from guetzli_tpu.ops import upsample as us
from guetzli_tpu.search import downsample as ds


def test_dct_double_roundtrip():
    rng = np.random.RandomState(0)
    b = rng.rand(5, 8, 8) * 255
    back = block_idct_double(block_dct_double(b))
    np.testing.assert_allclose(back, b, atol=1e-9)


def test_dct_double_dc():
    b = np.full((1, 8, 8), 128.0)
    dct = block_dct_double(b)
    # DC of a flat 128 block is 1024 (8 * 128), AC zero -- the -1024 offset
    # in SetDownsampledCoefficients centers it (output_image.cc:523).
    assert abs(dct[0, 0, 0] - 1024.0) < 1e-9
    assert np.abs(dct[0].reshape(-1)[1:]).max() < 1e-9


def test_downsampled_coefficients_flat():
    pix = np.full((32, 40), 200.0, dtype=np.float32)
    coeffs, bw, bh = ds.downsampled_coefficients(pix, 2, 2)
    assert (bw, bh) == (3, 2)
    flat = coeffs.reshape(bh * bw, 64)
    assert np.all(flat[:, 1:] == 0)
    assert np.all(flat[:, 0] == round((200 - 128) * 8))


def test_fancy_upsample_flat_exact():
    """A constant subsampled plane upsamples to the same constant."""
    sub = np.full((8, 10), 100 << 4, dtype=np.int64)
    import jax.numpy as jnp
    full = np.asarray(us.fancy_upsample(jnp.asarray(sub), 20, 16))
    assert np.all(full == 100 << 4)


def test_fancy_upsample_matches_neighborhood_version():
    rng = np.random.RandomState(1)
    hs, ws = 16, 24           # 2x3 chroma blocks
    sub = rng.randint(0, 255 << 4, size=(hs, ws)).astype(np.int64)
    import jax.numpy as jnp
    full = np.asarray(us.fancy_upsample(jnp.asarray(sub), ws * 2, hs * 2))
    neigh = us.neighborhoods_10x10(sub, ws // 8, hs // 8)
    per_block = np.asarray(us.upsample_16x16_from_neighborhood(
        jnp.asarray(neigh)))
    bw = ws // 8
    for b in range(neigh.shape[0]):
        by, bx = divmod(b, bw)
        want = full[16 * by:16 * by + 16, 16 * bx:16 * bx + 16]
        np.testing.assert_array_equal(per_block[b], want)


def test_preprocess_channel_noop_flags():
    rng = np.random.RandomState(2)
    yuv = rng.rand(3, 24, 24).astype(np.float32) * 255
    out = ds.preprocess_channel(24, 24, 2, 1.3, 0.5, False, False, yuv)
    np.testing.assert_array_equal(out, yuv)


def test_rgb_to_yuv420_gray_stability():
    """A flat gray image must stay (nearly) flat through the iterative
    silver-screen refinement."""
    rgb = np.full((16, 16, 3), 128, dtype=np.uint8)
    y, u, v = ds.rgb_to_yuv420(rgb, 16, 16)
    assert np.abs(np.asarray(y) - 128.0).max() < 1.0
    assert np.abs(np.asarray(u) - 128.0).max() < 1.0
    assert np.abs(np.asarray(v) - 128.0).max() < 1.0
