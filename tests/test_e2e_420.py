"""End-to-end YUV420 tests: JPEG 420 input and forced chroma downsampling."""

import io

import numpy as np
import pytest

from tests.conftest import FIXTURES

from guetzli_tpu import consts
from guetzli_tpu.search.processor import (Params, ProcessStats,
                                          process_jpeg_bytes, process_rgb)

# Reference encoder (CPU build of /root/reference) on the same 420 input
# (PIL quality=90 subsampling=2 of the bees96x64 crop): 1559 bytes,
# final distance 0.9541.
REF_420_SIZE = 1559


@pytest.fixture(scope="module")
def jpeg420():
    from PIL import Image
    buf = io.BytesIO()
    Image.open(FIXTURES / "bees96x64.png").save(
        buf, format="JPEG", quality=90, subsampling=2)
    return buf.getvalue()


def test_e2e_420_jpeg_input(jpeg420):
    params = Params()
    params.butteraugli_target = consts.butteraugli_score_for_quality(95)
    out = process_jpeg_bytes(params, jpeg420, ProcessStats())
    assert out is not None

    from PIL import Image
    im = Image.open(io.BytesIO(out))
    im.load()
    assert im.size == (96, 64)
    assert abs(len(out) - REF_420_SIZE) <= 0.04 * REF_420_SIZE, len(out)


def test_force_420_from_png():
    """PNG input with force_420: exercises the chroma pre-process +
    downsample + both 420 masking passes."""
    from guetzli_tpu.io.png import read_png
    with open(FIXTURES / "bees96x64.png", "rb") as f:
        rgb, w, h = read_png(f.read())
    params = Params(force_420=True)
    params.butteraugli_target = consts.butteraugli_score_for_quality(95)
    out = process_rgb(params, rgb, w, h, ProcessStats())

    from PIL import Image
    im = Image.open(io.BytesIO(out))
    im.load()
    assert im.size == (96, 64)
    # 420 output must be smaller than the 444 output for the same target.
    assert len(out) < 2450


def test_e2e_420_jpeg_input_160x120():
    """Second 420 golden point: reference encoder produced 5251 bytes for
    this input; ours must land within the band."""
    from PIL import Image
    buf = io.BytesIO()
    Image.open(FIXTURES / "bees160x120.png").save(
        buf, format="JPEG", quality=90, subsampling=2)
    params = Params()
    params.butteraugli_target = consts.butteraugli_score_for_quality(95)
    out = process_jpeg_bytes(params, buf.getvalue(), ProcessStats())
    assert out is not None
    im = Image.open(io.BytesIO(out))
    im.load()
    assert abs(len(out) - 5251) <= 0.025 * 5251, len(out)


def test_try_420_picks_best():
    """try_420 runs the 444 pass then the 420 pass and MaybeOutput keeps
    the better-scoring result (processor.cc:986-1016)."""
    from guetzli_tpu.io.png import read_png
    with open(FIXTURES / "bees96x64.png", "rb") as f:
        rgb, w, h = read_png(f.read())
    params = Params(try_420=True)
    params.butteraugli_target = consts.butteraugli_score_for_quality(95)
    out = process_rgb(params, rgb, w, h, ProcessStats())
    from PIL import Image
    im = Image.open(io.BytesIO(out))
    im.load()
    assert im.size == (96, 64)
    # Must not be worse than the 444-only result by more than the band.
    assert len(out) <= 2373


def test_e2e_420_odd_size():
    """Odd (non-multiple-of-16) geometry exercises chroma clamping,
    padding blocks with DC propagation, and edge replication. The
    reference encoder produced 2084 bytes for this 97x63 420 input (ours
    matched byte-for-byte-count when captured)."""
    from PIL import Image
    buf = io.BytesIO()
    Image.open(FIXTURES / "bees97x63.png").save(
        buf, format="JPEG", quality=90, subsampling=2)
    params = Params()
    params.butteraugli_target = consts.butteraugli_score_for_quality(95)
    out = process_jpeg_bytes(params, buf.getvalue(), ProcessStats())
    assert out is not None
    assert abs(len(out) - 2084) <= 0.025 * 2084, len(out)


def test_e2e_444_odd_size_png():
    """97x63 PNG input: reference produced 3466 bytes."""
    from guetzli_tpu.io.png import read_png
    with open(FIXTURES / "bees97x63.png", "rb") as f:
        rgb, w, h = read_png(f.read())
    assert (w, h) == (97, 63)
    params = Params()
    params.butteraugli_target = consts.butteraugli_score_for_quality(95)
    out = process_rgb(params, rgb, w, h, ProcessStats())
    assert abs(len(out) - 3466) <= 0.025 * 3466, len(out)


def test_silver_screen_force_420():
    """use_silver_screen routes Downsample through the iterative
    RGB->YUV420 refinement (output_image.cc:540-548); output must decode
    and land under target like the normal 420 path."""
    from guetzli_tpu.io.png import read_png
    with open(FIXTURES / "bees96x64.png", "rb") as f:
        rgb, w, h = read_png(f.read())
    params = Params(force_420=True, use_silver_screen=True)
    params.butteraugli_target = consts.butteraugli_score_for_quality(95)
    out = process_rgb(params, rgb, w, h, ProcessStats())
    from PIL import Image
    im = Image.open(io.BytesIO(out))
    im.load()
    assert im.size == (96, 64)
