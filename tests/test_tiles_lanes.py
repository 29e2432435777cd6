"""Lane-major tile compare (ops/tiles_lanes.py) vs the standard path.

The two paths compute the same math in different layouts (tiles-last vs
tiles-leading) with reassociated reductions and the closed-form LUT reads,
so errors agree to float32 tolerance, not bitwise.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.conftest import FIXTURES


@pytest.fixture(scope="module")
def block_state():
    from guetzli_tpu import consts
    from guetzli_tpu.codec.encoder import encode_rgb_to_jpeg
    from guetzli_tpu.comparator import Comparator
    from guetzli_tpu.io.png import read_png
    from guetzli_tpu.search import state as st

    with open(FIXTURES / "bees96x64.png", "rb") as f:
        rgb, w, h = read_png(f.read())
    target = consts.butteraugli_score_for_quality(95)
    comp = Comparator(rgb, w, h, target)
    jpg = encode_rgb_to_jpeg(rgb, w, h)
    st.remove_original_quantization(jpg)
    img = st.CoeffImage.from_jpeg(jpg)
    comp.compare(np.stack([c.coeffs for c in img.comps], 0),
                 img.bw, img.bh)
    comp.start_block_comparisons()
    xyb0_tiles, scales, ysel, xsel = comp.block_state(1, 1)
    g = comp.geom
    if g is not None:
        cand = g.pad_blocks(img.coeffs, img.bw, img.bh, g.bwp, g.bhp)
    else:
        cand = img.coeffs
    cand = jnp.asarray(np.asarray(cand).transpose(1, 0, 2))  # [N, 3, 64]
    return cand, xyb0_tiles, scales, ysel, xsel


def test_lanes_matches_standard(block_state):
    from guetzli_tpu.ops import tiles as tile_ops
    from guetzli_tpu.ops import tiles_lanes as tl

    cand, xyb0_tiles, scales, ysel, xsel = block_state

    lin = tile_ops.tiles_to_linear_rgb(cand, xsel, ysel)
    want = np.asarray(tile_ops.compare_blocks(xyb0_tiles, lin, scales))

    aux_t = tl.transpose_aux_444(xyb0_tiles, scales, ysel, xsel)
    got = np.asarray(tl.compare_blocks_lanes444(cand, *aux_t))

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3)


def test_lanes_zeroed_candidates(block_state):
    """Same check on perturbed candidates (zeroed coefficients), the
    zeroing loop's actual inputs."""
    from guetzli_tpu.ops import tiles as tile_ops
    from guetzli_tpu.ops import tiles_lanes as tl

    cand, xyb0_tiles, scales, ysel, xsel = block_state
    c = np.asarray(cand).copy()
    rng = np.random.default_rng(3)
    mask = rng.random(c.shape) < 0.4
    mask[:, :, 0] = False
    c[mask] = 0
    cand = jnp.asarray(c)

    lin = tile_ops.tiles_to_linear_rgb(cand, xsel, ysel)
    want = np.asarray(tile_ops.compare_blocks(xyb0_tiles, lin, scales))
    aux_t = tl.transpose_aux_444(xyb0_tiles, scales, ysel, xsel)
    got = np.asarray(tl.compare_blocks_lanes444(cand, *aux_t))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3)


def test_lanes_420y_matches_standard():
    """Lane-major 420 Y-pass evaluation vs the standard path on a real
    force-420 image state."""
    from guetzli_tpu import consts
    from guetzli_tpu.codec.encoder import encode_rgb_to_jpeg
    from guetzli_tpu.comparator import Comparator
    from guetzli_tpu.io.png import read_png
    from guetzli_tpu.ops import tiles as tile_ops
    from guetzli_tpu.ops import tiles_lanes as tl
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
    xyb0_tiles, scales, ysel, xsel = comp.block_state(1, 1)

    g = comp.geom
    yc = img.comps[0].coeffs
    if g is not None:
        yc = g.pad_blocks(yc, img.comps[0].bw, img.comps[0].bh,
                          g.bwp, g.bhp)
    cand_y = jnp.asarray(np.asarray(yc, dtype=np.int32))

    want = np.asarray(tile_ops.compare_blocks_420y(
        cand_y, jnp.asarray(chroma_bytes), xyb0_tiles, scales,
        ysel, xsel))
    aux_t = tl.transpose_aux_420y(chroma_bytes, xyb0_tiles, scales,
                                  ysel, xsel)
    got = np.asarray(tl.compare_blocks_lanes420y(cand_y, *aux_t))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3)


def test_lanes_420c_matches_standard():
    """Lane-major 420 chroma-pass evaluation vs the standard path on a
    real force-420 image state (the full aux as masking_aux builds it)."""
    import os

    from guetzli_tpu import consts
    from guetzli_tpu.codec.encoder import encode_rgb_to_jpeg
    from guetzli_tpu.comparator import Comparator
    from guetzli_tpu.io.png import read_png
    from guetzli_tpu.ops import tiles as tile_ops
    from guetzli_tpu.ops import tiles_lanes as tl
    from guetzli_tpu.search.processor import Params, Processor, ProcessStats
    from guetzli_tpu.search import state as st

    with open(FIXTURES / "bees96x64.png", "rb") as f:
        rgb, w, h = read_png(f.read())
    target = consts.butteraugli_score_for_quality(95)
    comp = Comparator(rgb, w, h, target)
    proc = Processor(Params(force_420=True), comp, ProcessStats())
    jpg = encode_rgb_to_jpeg(rgb, w, h)
    st.remove_original_quantization(jpg)
    img = st.CoeffImage.from_jpeg(jpg)
    img.downsample()
    comp.compare_img(img)
    grid = img.comps[2]

    os.environ["GUETZLI_TPU_LANES"] = "0"
    try:
        mode_s, aux_s = proc.masking_aux(img, 6, grid)
    finally:
        os.environ.pop("GUETZLI_TPU_LANES", None)
    assert mode_s == "420c"

    g = comp.geom
    cands = []
    for c in (1, 2):
        cc = img.comps[c].coeffs
        if g is not None:
            cbwp, cbhp = g.wp // 16, g.hp // 16
            cc = g.pad_blocks(cc, img.comps[c].bw, img.comps[c].bh,
                              cbwp, cbhp)
        cands.append(np.asarray(cc, dtype=np.int32))
    cand_u, cand_v = (jnp.asarray(c) for c in cands)

    want = np.asarray(tile_ops.compare_blocks_420c(
        cand_u, cand_v, *aux_s))
    aux_t = tl.transpose_aux_420c(*aux_s)
    got = np.asarray(tl.compare_blocks_lanes420c(cand_u, cand_v, *aux_t))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3)
