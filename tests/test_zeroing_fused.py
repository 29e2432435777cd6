"""Fused greedy-loop kernel (kernels/zeroing_loop.py) vs the staged
while_loop path: the CSR candidate arrays must match bit-for-bit -- the
two paths share the per-lane evaluation chain (ops/tiles_lanes.py), so
any divergence is a greedy-bookkeeping bug, not float noise.

Runs the kernel in interpret mode (CPU backend, GUETZLI_TPU_ZEROING_FUSED
=1); the hardware Mosaic compile is probed by tools/tpu_capture.py.
"""

import numpy as np
import pytest

from tests.conftest import FIXTURES

from guetzli_tpu.comparator import Comparator
from guetzli_tpu.io.png import read_png
from guetzli_tpu.search import zeroing


@pytest.fixture(scope="module")
def setup():
    from guetzli_tpu.codec.encoder import encode_rgb_to_jpeg
    with open(FIXTURES / "bees96x64.png", "rb") as f:
        rgb, w, h = read_png(f.read())
    jpg = encode_rgb_to_jpeg(
        rgb, w, h, quant=np.full((3, 64), 5, dtype=np.int32))
    coeffs = np.stack([c.coeffs.astype(np.int32) * 5
                       for c in jpg.components])
    comp = Comparator(rgb, w, h, 1.0, padded=False)
    comp.start_block_comparisons()
    aux = comp.block_state(1, 1)
    cand = np.transpose(coeffs, (1, 0, 2)).copy()   # [NB, 3, 64]
    return cand, aux


def _csr(cand, aux, limit, monkeypatch, fused, tile_n=128,
         early_exit=False, real_index=None):
    import jax.numpy as jnp
    if fused:
        monkeypatch.setenv("GUETZLI_TPU_ZEROING_FUSED", "1")
        monkeypatch.setenv("GUETZLI_TPU_ZEROING_TILE_N", str(tile_n))
    else:
        monkeypatch.setenv("GUETZLI_TPU_ZEROING_FUSED", "0")
    aux_dev = tuple(jnp.asarray(a) for a in aux)
    return zeroing.compute_zeroing_csr_staged(
        cand, cand, limit, aux_dev, "444l", 7,
        real_index=real_index, early_exit=early_exit)


@pytest.mark.parametrize("limit", [0.8, 2.5])
def test_fused_matches_staged(setup, monkeypatch, limit):
    cand, aux = setup
    want = _csr(cand, aux, np.float32(limit), monkeypatch, fused=False)
    got = _csr(cand, aux, np.float32(limit), monkeypatch, fused=True)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(w, g)


def test_fused_early_exit(setup, monkeypatch):
    """The --c fast path: per-block loop stops at the error limit."""
    cand, aux = setup
    want = _csr(cand, aux, np.float32(1.2), monkeypatch, fused=False,
                early_exit=True)
    got = _csr(cand, aux, np.float32(1.2), monkeypatch, fused=True,
               early_exit=True)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(w, g)


def test_fused_multi_tile_vector_limit(setup, monkeypatch):
    """Two concatenated images with distinct limits and bucket padding:
    exercises >1 grid step, per-tile trip bounds, per-lane limit vector,
    and real_index row dropping."""
    import jax.numpy as jnp
    cand, aux = setup
    nb = cand.shape[0]
    pad = 7
    cand_p = np.concatenate([cand, np.zeros((pad, 3, 64), cand.dtype)])
    aux_p = tuple(
        np.concatenate([np.asarray(a),
                        np.zeros((pad,) + np.asarray(a).shape[1:],
                                 np.asarray(a).dtype)])
        for a in aux)
    cat = np.concatenate([cand_p, cand_p])
    cat_aux = tuple(jnp.asarray(np.concatenate([a, a])) for a in aux_p)
    lim_vec = np.concatenate([
        np.full(nb + pad, 0.9, np.float32),
        np.full(nb + pad, 2.0, np.float32)])
    real_index = np.concatenate([
        np.arange(nb, dtype=np.int64),
        (nb + pad) + np.arange(nb, dtype=np.int64)])

    want = _csr(cat, cat_aux, lim_vec, monkeypatch, fused=False,
                real_index=real_index)
    got = _csr(cat, cat_aux, lim_vec, monkeypatch, fused=True,
               real_index=real_index)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(w, g)


def test_fused_420y_matches_staged(monkeypatch):
    """The 420 Y-pass fused kernel vs the staged path on a real
    force-420 image state (harness per test_tiles_lanes)."""
    import jax.numpy as jnp

    from guetzli_tpu import consts
    from guetzli_tpu.codec.encoder import encode_rgb_to_jpeg
    from guetzli_tpu.search import state as st

    with open(FIXTURES / "bees96x64.png", "rb") as f:
        rgb, w, h = read_png(f.read())
    target = consts.butteraugli_score_for_quality(95)
    comp = Comparator(rgb, w, h, target)
    jpg = encode_rgb_to_jpeg(rgb, w, h)
    st.remove_original_quantization(jpg)
    img = st.CoeffImage.from_jpeg(jpg)
    img.downsample()
    comp.compare_img(img)
    comp.start_block_comparisons()
    chroma_bytes = comp.frozen_chroma_blocks(img)
    aux = (jnp.asarray(np.asarray(chroma_bytes)),) + comp.block_state(1, 1)

    g = comp.geom
    yc = img.comps[0].coeffs
    bw, bh = img.comps[0].bw, img.comps[0].bh
    if g is not None:
        yc = g.pad_blocks(yc, bw, bh, g.bwp, g.bhp)
    nb = yc.shape[0]
    blocks = np.zeros((nb, 3, 64), np.int32)
    blocks[:, 0] = np.asarray(yc, np.int32)

    def run(fused):
        if fused:
            monkeypatch.setenv("GUETZLI_TPU_ZEROING_FUSED", "1")
            monkeypatch.setenv("GUETZLI_TPU_ZEROING_TILE_N", "128")
        else:
            monkeypatch.setenv("GUETZLI_TPU_ZEROING_FUSED", "0")
        return zeroing.compute_zeroing_csr_staged(
            blocks, blocks, np.float32(1.1), aux, "420yl", 1)

    want = run(False)
    got = run(True)
    for w_, g_ in zip(want, got):
        np.testing.assert_array_equal(w_, g_)


def test_row_argsort_equivalence():
    """_argsort_rows_stable (torch path at >=16384 rows) must equal
    numpy's stable row argsort, including +inf ties (masked candidate
    slots) and duplicated scores."""
    rng = np.random.default_rng(11)
    scores = rng.standard_normal((20000, 192)).astype(np.float32)
    # Mask ~60% of slots to +inf (like invalid candidates) and inject
    # heavy duplication.
    mask = rng.random(scores.shape) < 0.6
    scores[mask] = np.inf
    scores[~mask] = np.round(scores[~mask], 1)   # many exact ties
    want = np.argsort(scores, axis=1, kind="stable")
    got = zeroing._argsort_rows_stable(scores)
    np.testing.assert_array_equal(want, got)


def test_fused_force420_end_to_end(monkeypatch):
    """Force-420 encode through the fused 420-Y AND 420-chroma kernels
    (interpret mode) must be byte-identical to the staged path."""
    from guetzli_tpu import consts
    from guetzli_tpu.search.processor import (Params, ProcessStats,
                                              process_rgb)

    with open(FIXTURES / "bees96x64.png", "rb") as f:
        rgb, w, h = read_png(f.read())
    p = Params()
    p.butteraugli_target = consts.butteraugli_score_for_quality(88)
    p.force_420 = True
    monkeypatch.setenv("GUETZLI_TPU_ZEROING_TILE_N", "128")

    monkeypatch.setenv("GUETZLI_TPU_ZEROING_FUSED", "0")
    want = process_rgb(p, rgb, w, h, ProcessStats())
    monkeypatch.setenv("GUETZLI_TPU_ZEROING_FUSED", "1")
    got = process_rgb(p, rgb, w, h, ProcessStats())
    assert want == got
