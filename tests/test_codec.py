"""Codec parity tests: initial encode coefficients, bit-exact writer output,
and the coefficients->sRGB reconstruction path, all against fixtures dumped
from the reference encoder."""

import pathlib

import numpy as np
import pytest

from guetzli_tpu.codec.encoder import encode_rgb_to_jpeg
from guetzli_tpu.codec.writer import write_jpeg
from guetzli_tpu.ops import image as gimg

from tests.conftest import FIXTURES, load_f32, load_u8


def _init_jpg(w, h):
    rgb = load_u8(f"{w}x{h}_rgb0.u8", (h, w, 3))
    return encode_rgb_to_jpeg(rgb, w, h)


def test_initial_encode_coeffs(size):
    w, h = size
    jpg = _init_jpg(w, h)
    nb = jpg.components[0].num_blocks
    ref = load_f32(f"{w}x{h}_init_coeffs.f32", (3, nb, 64)).astype(np.int32)
    for c in range(3):
        np.testing.assert_array_equal(jpg.components[c].coeffs, ref[c])


def test_writer_bit_exact(size):
    w, h = size
    jpg = _init_jpg(w, h)
    got = write_jpeg(jpg, strip_metadata=True)
    ref = (FIXTURES / f"{w}x{h}_init.jpg").read_bytes()
    assert got == ref


def test_roundtrip_srgb(size):
    """coeffs (quant=1) -> IDCT -> pixel cache -> YCbCr->RGB, vs reference
    OutputImage::ToSRGB."""
    w, h = size
    jpg = _init_jpg(w, h)
    bw, bh = jpg.MCU_cols, jpg.MCU_rows
    coeffs = np.stack([c.coeffs.astype(np.int32) for c in jpg.components])
    rgb = np.asarray(gimg.coeffs_to_linear_rgb(coeffs, bw, bh, w, h))
    # compare the integer sRGB stage instead: recompute
    pix = np.asarray(gimg.idct_blocks(coeffs)) << 4
    planes = np.asarray(gimg.blocks_to_plane(pix, bw, bh, w, h))
    srgb = np.asarray(gimg.pixels_to_srgb(planes, w))
    ref = load_u8(f"{w}x{h}_roundtrip_srgb.u8", (h, w, 3))
    np.testing.assert_array_equal(
        np.moveaxis(srgb, 0, -1).astype(np.uint8), ref)


def test_decodable_by_pillow(size):
    from PIL import Image
    import io
    w, h = size
    jpg = _init_jpg(w, h)
    data = write_jpeg(jpg, strip_metadata=True)
    im = Image.open(io.BytesIO(data))
    assert im.size == (w, h)


def test_native_quantize_blocks_matches_python():
    """gt_quantize_blocks vs the numpy magnitude form (state.quantize)."""
    import numpy as np

    from guetzli_tpu import native
    from guetzli_tpu.search import state as st

    if native.get_lib() is None:
        import pytest
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(7)
    c = rng.integers(-4096, 4097, size=(3000, 64), dtype=np.int32)
    q = rng.integers(1, 255, size=64, dtype=np.int32)
    got = st.quantize(c, q[None, :])
    real = native.get_lib
    native.get_lib = lambda: None
    try:
        want = st.quantize(c, q[None, :])
    finally:
        native.get_lib = real
    assert np.array_equal(got, want)


def test_native_ac_histogram_matches_python():
    """gt_ac_histogram vs the vectorized ac_symbols builder."""
    import numpy as np

    from guetzli_tpu import native
    from guetzli_tpu.codec import histograms as hg

    if native.get_lib() is None:
        import pytest
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(11)
    qc = rng.integers(-1200, 1201, size=(4000, 64)).astype(np.int16)
    qc[rng.random(qc.shape) < 0.8] = 0
    qc[:17] = 0                       # all-zero blocks (pure EOB)
    qc[17:21, 63] = 5                 # blocks ending in a nonzero (no EOB)
    got = hg.build_ac_histogram(qc)
    real = native.get_lib
    native.get_lib = lambda: None
    try:
        want = hg.build_ac_histogram(qc)
    finally:
        native.get_lib = real
    assert np.array_equal(got, want)
