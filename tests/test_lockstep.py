"""Lockstep corpus quant search vs the serial per-image search.

The lockstep driver interleaves dispatch/fetch across images; every
image's decision sequence, chosen quant matrix, logged iterations and
best-so-far output must be identical to running
Processor.select_quant_matrix serially per image.
"""

import numpy as np

from tests.conftest import FIXTURES

from guetzli_tpu import consts
from guetzli_tpu.codec.encoder import encode_rgb_to_jpeg
from guetzli_tpu.comparator import Comparator
from guetzli_tpu.io.png import read_png
from guetzli_tpu.parallel.lockstep import lockstep_select_quant_matrix
from guetzli_tpu.search import state as st
from guetzli_tpu.search.processor import (Params, Processor, ProcessStats,
                                          _copy_jpeg)

_NAMES = ("bees96x64.png", "synth128x96.png", "bees97x63.png")


def _setup(name):
    """Replicate process_jpeg_data's pre-quant steps for one image."""
    rgb, w, h = read_png((FIXTURES / name).read_bytes())
    jpg_in = encode_rgb_to_jpeg(rgb, w, h)
    params = Params()
    params.butteraugli_target = consts.butteraugli_score_for_quality(95)
    comp = Comparator(rgb, w, h, params.butteraugli_target)
    proc = Processor(params, comp, ProcessStats())
    proc.final.score = -1
    jpg = _copy_jpeg(jpg_in)
    q_in = st.remove_original_quantization(jpg)
    img = st.CoeffImage.from_jpeg(jpg)
    return proc, jpg, q_in.copy(), img


def test_lockstep_quant_matches_serial(monkeypatch):
    monkeypatch.setenv("GUETZLI_TPU_SPECULATE", "0")

    serial = []
    for name in _NAMES:
        proc, jpg, best_q, img = _setup(name)
        ok = proc.select_quant_matrix(jpg, False, best_q, img)
        serial.append((ok, best_q, proc.stats.counters["iters"],
                       proc.final.jpeg_data, proc.final.score))

    procs, jpgs, best_qs, imgs = [], [], [], []
    for name in _NAMES:
        proc, jpg, best_q, img = _setup(name)
        procs.append(proc)
        jpgs.append(jpg)
        best_qs.append(best_q)
        imgs.append(img)
    oks = lockstep_select_quant_matrix(
        procs, jpgs, [False] * len(_NAMES), best_qs, imgs)

    for i, name in enumerate(_NAMES):
        s_ok, s_q, s_iters, s_out, s_score = serial[i]
        assert oks[i] == s_ok, name
        np.testing.assert_array_equal(best_qs[i], s_q, err_msg=name)
        assert procs[i].stats.counters["iters"] == s_iters, name
        assert procs[i].final.jpeg_data == s_out, name
        assert procs[i].final.score == s_score, name


def test_encode_corpus_lockstep_byte_identical():
    """Full lockstep corpus encode (lockstep quant + one combined zeroing
    run + per-image back-end) vs serial encode_bytes per image."""
    from guetzli_tpu.parallel.api import encode_bytes
    from guetzli_tpu.parallel.lockstep import encode_corpus_lockstep

    inputs = [(n, (FIXTURES / n).read_bytes()) for n in _NAMES]
    lock = dict(encode_corpus_lockstep(inputs, quality=95))
    for name, data in inputs:
        serial = encode_bytes(data, quality=95)
        assert lock[name] == serial, (
            name, len(lock[name]), len(serial))


def test_encode_corpus_lockstep_force_420_byte_identical():
    """420 pass alignment: force_420 corpus encode must match serial
    process_rgb(force_420) per image byte-for-byte (exercises the 420y
    and 420c masking passes over concatenated blocks)."""
    from guetzli_tpu.io.png import read_png
    from guetzli_tpu.parallel.lockstep import encode_corpus_lockstep
    from guetzli_tpu.search.processor import process_rgb

    names = ("bees96x64.png", "bees97x63.png")
    inputs = [(n, (FIXTURES / n).read_bytes()) for n in names]
    lock = dict(encode_corpus_lockstep(inputs, quality=95,
                                       force_420=True))
    for name, data in inputs:
        rgb, w, h = read_png(data)
        params = Params(force_420=True)
        params.butteraugli_target = \
            consts.butteraugli_score_for_quality(95)
        serial = process_rgb(params, rgb, w, h, ProcessStats())
        assert lock[name] == serial, (name, len(lock[name]), len(serial))


def test_encode_corpus_lockstep_try_420_byte_identical():
    """try_420 runs both the 444 and 420 pass groups across the corpus;
    MaybeOutput keeps the better result exactly as in the serial path."""
    from guetzli_tpu.io.png import read_png
    from guetzli_tpu.parallel.lockstep import encode_corpus_lockstep
    from guetzli_tpu.search.processor import process_rgb

    names = ("bees96x64.png", "synth128x96.png")
    inputs = [(n, (FIXTURES / n).read_bytes()) for n in names]
    lock = dict(encode_corpus_lockstep(inputs, quality=95, try_420=True))
    for name, data in inputs:
        rgb, w, h = read_png(data)
        params = Params(try_420=True)
        params.butteraugli_target = \
            consts.butteraugli_score_for_quality(95)
        serial = process_rgb(params, rgb, w, h, ProcessStats())
        assert lock[name] == serial, (name, len(lock[name]), len(serial))


def test_encode_corpus_lockstep_jpeg_inputs_byte_identical():
    """JPEG inputs join the lockstep corpus: a 420 JPEG runs only the 420
    pass group (input_is_420 forces it per image), a 444 JPEG runs the
    444 group, mixed with a PNG -- all byte-identical to serial."""
    import io

    from PIL import Image

    from guetzli_tpu.parallel.api import encode_bytes
    from guetzli_tpu.parallel.lockstep import encode_corpus_lockstep

    buf = io.BytesIO()
    Image.open(FIXTURES / "bees96x64.png").save(
        buf, format="JPEG", quality=90, subsampling=2)
    jpeg420 = buf.getvalue()
    jpeg444 = (FIXTURES / "bees96x64_ref_q95.jpg").read_bytes()
    inputs = [("in420.jpg", jpeg420),
              ("plain.png", (FIXTURES / "bees97x63.png").read_bytes()),
              ("in444.jpg", jpeg444)]
    lock = dict(encode_corpus_lockstep(inputs, quality=95))
    for name, data in inputs:
        serial = encode_bytes(data, quality=95)
        assert lock[name] == serial, (name, len(lock[name]), len(serial))


def test_encode_corpus_lockstep_grayscale_and_silver_screen():
    """Edge cases: a grayscale PNG under try_420 skips the 420 group for
    that image only (_is_grayscale, processor.cc:1000), and
    use_silver_screen routes the corpus 420 downsample through the
    iterative RGB->YUV420 refinement -- both byte-identical to serial."""
    import numpy as np
    from PIL import Image
    import io

    from guetzli_tpu.io.png import read_png
    from guetzli_tpu.parallel.lockstep import encode_corpus_lockstep
    from guetzli_tpu.search.processor import process_rgb

    rng = np.random.default_rng(5)
    gray = np.repeat(rng.integers(0, 256, (48, 64, 1), np.uint8), 3,
                     axis=2)
    buf = io.BytesIO()
    Image.fromarray(gray).save(buf, format="PNG")
    inputs = [("gray.png", buf.getvalue()),
              ("color.png", (FIXTURES / "bees96x64.png").read_bytes())]

    for kw in ({"try_420": True},
               {"force_420": True, "use_silver_screen": True}):
        lock = dict(encode_corpus_lockstep(inputs, quality=95, **kw))
        for name, data in inputs:
            rgb, w, h = read_png(data)
            params = Params(**kw)
            params.butteraugli_target = \
                consts.butteraugli_score_for_quality(95)
            serial = process_rgb(params, rgb, w, h, ProcessStats())
            assert lock[name] == serial, (kw, name)
