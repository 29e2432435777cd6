"""Native PNG decoder (native/src/png_decode.cc) vs the PIL fallback.

Both implement the reference's libpng ingest path (guetzli.cc:47-153:
PACKING|EXPAND|STRIP_16 + blend-on-black); they must agree byte-for-byte
on every mode libpng's transforms can produce.
"""

import io

import numpy as np
import pytest
from PIL import Image

from tests.conftest import FIXTURES

from guetzli_tpu.io import png as png_io


def _native(data):
    res = png_io._read_png_native(data)
    if res is None:
        pytest.skip("native PNG decoder unavailable")
    return res


def _pil_reference(data):
    """The pure-PIL path, bypassing the native decoder."""
    im = Image.open(io.BytesIO(data))
    if im.mode == "P":
        im = im.convert("RGBA" if "transparency" in im.info else "RGB")
    if im.mode in ("I", "I;16", "I;16B"):
        arr = np.asarray(im, dtype=np.uint16)
        im = Image.fromarray((arr >> 8).astype(np.uint8), mode="L")
    arr = np.asarray(im)
    if im.mode == "L":
        rgb = np.repeat(arr[:, :, None], 3, axis=2)
    elif im.mode == "LA":
        gray = png_io.blend_on_black(arr[:, :, 0], arr[:, :, 1])
        rgb = np.repeat(gray[:, :, None], 3, axis=2)
    elif im.mode == "RGB":
        rgb = arr
    elif im.mode == "RGBA":
        rgb = png_io.blend_on_black(arr[:, :, :3], arr[:, :, 3:4])
    else:
        rgb = np.asarray(im.convert("RGB"))
    return np.ascontiguousarray(rgb, dtype=np.uint8)


def _png_bytes(im, **kw):
    buf = io.BytesIO()
    im.save(buf, format="PNG", **kw)
    return buf.getvalue()


def _rng_img(w, h, mode, seed=0):
    rng = np.random.default_rng(seed)
    ch = {"L": 1, "LA": 2, "RGB": 3, "RGBA": 4}[mode]
    arr = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
    if ch == 1:
        arr = arr[:, :, 0]
    return Image.fromarray(arr, mode=mode)


@pytest.mark.parametrize("mode", ["L", "LA", "RGB", "RGBA"])
def test_native_matches_pil_modes(mode):
    data = _png_bytes(_rng_img(37, 23, mode, seed=hash(mode) % 100))
    rgb, w, h = _native(data)
    assert (w, h) == (37, 23)
    np.testing.assert_array_equal(rgb, _pil_reference(data))


@pytest.mark.parametrize("mode", ["RGB", "RGBA", "L"])
def test_native_interlaced(mode):
    # Adam7: exercises all 7 passes including the partial last columns.
    data = _png_bytes(_rng_img(21, 13, mode, seed=7), interlace=True)
    rgb, w, h = _native(data)
    assert (w, h) == (21, 13)
    np.testing.assert_array_equal(rgb, _pil_reference(data))


def test_native_palette():
    im = _rng_img(19, 11, "RGB", seed=3).quantize(colors=17)
    data = _png_bytes(im)
    rgb, _, _ = _native(data)
    np.testing.assert_array_equal(rgb, _pil_reference(data))


def test_native_palette_trns():
    im = _rng_img(19, 11, "RGBA", seed=4).quantize(colors=13)
    data = _png_bytes(im)
    assert b"tRNS" in data
    rgb, _, _ = _native(data)
    np.testing.assert_array_equal(rgb, _pil_reference(data))


@pytest.mark.parametrize("bits", [1, 2, 4])
def test_native_low_bit_gray(bits):
    rng = np.random.default_rng(bits)
    levels = 1 << bits
    arr = (rng.integers(0, levels, (9, 31), dtype=np.uint8)
           * (255 // (levels - 1)))
    data = _png_bytes(Image.fromarray(arr, "L"), bits=bits)
    rgb, w, h = _native(data)
    assert (w, h) == (31, 9)
    np.testing.assert_array_equal(rgb, _pil_reference(data))


def test_native_16bit_gray():
    rng = np.random.default_rng(16)
    arr = rng.integers(0, 1 << 16, (12, 18), dtype=np.uint16)
    im = Image.fromarray(arr.astype(np.int32), mode="I")
    data = _png_bytes(im)
    rgb, _, _ = _native(data)
    # STRIP_16: high byte.
    expect = np.repeat((arr >> 8).astype(np.uint8)[:, :, None], 3, axis=2)
    np.testing.assert_array_equal(rgb, expect)


def test_native_fixture_matches_pil():
    for name in ("bees96x64.png", "bees160x120.png", "bees97x63.png",
                 "synth128x96.png"):
        data = (FIXTURES / name).read_bytes()
        rgb, _, _ = _native(data)
        np.testing.assert_array_equal(rgb, _pil_reference(data), err_msg=name)


def test_native_rejects_garbage():
    assert png_io._read_png_native(b"not a png at all") in (None,)
    assert png_io._read_png_native(b"\x89PNG\r\n\x1a\n trunc") in (None,)


def test_read_png_uses_native():
    data = (FIXTURES / "bees96x64.png").read_bytes()
    rgb, w, h = png_io.read_png(data)
    assert (w, h, rgb.shape) == (96, 64, (64, 96, 3))


def test_native_fuzz_no_crash():
    """Deterministic mutation fuzz of the native decoder (the fuzz_target.cc
    pattern applied to PNG ingest): truncations and byte flips of valid
    files must return None or a well-formed array, never crash."""
    rng = np.random.default_rng(0xC0FFEE)
    seeds = [
        _png_bytes(_rng_img(23, 17, "RGBA", seed=1)),
        _png_bytes(_rng_img(16, 16, "RGB", seed=2), interlace=True),
        _png_bytes(_rng_img(20, 10, "RGB", seed=3).quantize(colors=7)),
    ]
    for data in seeds:
        for cut in rng.integers(1, len(data), 40):
            png_io._read_png_native(data[:int(cut)])
        for _ in range(120):
            mutated = bytearray(data)
            for pos in rng.integers(0, len(data), int(rng.integers(1, 4))):
                mutated[int(pos)] ^= int(rng.integers(1, 256))
            res = png_io._read_png_native(bytes(mutated))
            if res is not None:
                rgb, w, h = res
                assert rgb.shape == (h, w, 3)
