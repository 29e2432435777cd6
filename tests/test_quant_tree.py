"""Tree-quant (wave-speculative) search vs the serial quant loop.

select_quant_matrix_tree replays the serial loop with memoized device
scores; its decisions, iteration counts, logs and outputs must be
identical. This is the production accelerator path (Processor.
select_quant_matrix chooses it off-CPU), so it needs CPU coverage: the
device-side requantization (_device_quantize) must stay a bit-exact twin
of the host apply_global_quantization or the replay diverges.
"""

import numpy as np

from tests.conftest import FIXTURES

from guetzli_tpu import consts
from guetzli_tpu.codec.encoder import encode_rgb_to_jpeg
from guetzli_tpu.comparator import Comparator
from guetzli_tpu.io.png import read_png
from guetzli_tpu.search import state as st
from guetzli_tpu.search.processor import (Params, Processor, ProcessStats,
                                          _copy_jpeg)

_NAMES = ("bees96x64.png", "bees97x63.png")


def _setup(name):
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


def test_tree_quant_matches_serial(monkeypatch):
    from guetzli_tpu.search.quant_tree import select_quant_matrix_tree

    monkeypatch.setenv("GUETZLI_TPU_SPECULATE", "0")
    for name in _NAMES:
        proc, jpg, best_q, img = _setup(name)
        s_ok = proc.select_quant_matrix(jpg, False, best_q, img)
        serial = (s_ok, best_q.copy(), proc.stats.counters["iters"],
                  proc.final.jpeg_data, proc.final.score)

        proc2, jpg2, best_q2, img2 = _setup(name)
        t_ok = select_quant_matrix_tree(proc2, jpg2, False, best_q2, img2)
        assert t_ok == s_ok, name
        np.testing.assert_array_equal(best_q2, serial[1], err_msg=name)
        assert proc2.stats.counters["iters"] == serial[2], name
        assert proc2.final.jpeg_data == serial[3], name
        assert proc2.final.score == serial[4], name


def test_tree_quant_env_flag_full_encode(monkeypatch):
    """GUETZLI_TPU_TREE_QUANT=1 end to end: the full encode must be
    byte-identical to the default serial-quant encode."""
    from guetzli_tpu.search.processor import process_rgb

    rgb, w, h = read_png((FIXTURES / "bees96x64.png").read_bytes())
    params = Params()
    params.butteraugli_target = consts.butteraugli_score_for_quality(95)
    monkeypatch.setenv("GUETZLI_TPU_TREE_QUANT", "0")
    base = process_rgb(params, rgb, w, h, ProcessStats())
    monkeypatch.setenv("GUETZLI_TPU_TREE_QUANT", "1")
    tree = process_rgb(params, rgb, w, h, ProcessStats())
    assert tree == base
