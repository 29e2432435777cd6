"""Stage-by-stage parity tests of the JAX butteraugli vs the reference
encoder (fixtures dumped by tests/fixtures_gen/dump_ref.cc — the checkcl
pattern, with the reference CPU path as oracle)."""

import numpy as np
import pytest

from guetzli_tpu import consts
from guetzli_tpu.ops import blockdiff as bd
from guetzli_tpu.ops import diffmap as dm
from guetzli_tpu.ops.blur import blur
from guetzli_tpu.ops.opsin import opsin_dynamics_image

from tests.conftest import load_f32, load_u8


def _lin(w, h, which=0):
    rgb = load_u8(f"{w}x{h}_rgb{which}.u8", (h * w, 3))
    lut = consts.SRGB_TO_LINEAR.astype(np.float32)
    return lut[rgb].T.reshape(3, h, w)


def _rel_close(a, b, rtol, atol):
    np.testing.assert_allclose(np.asarray(a), b, rtol=rtol, atol=atol)


def test_srgb_lut(size):
    w, h = size
    ref = load_f32(f"{w}x{h}_lin0.f32", (3, h, w))
    _rel_close(_lin(w, h, 0), ref, 1e-6, 1e-6)


@pytest.mark.parametrize("sigma,tag", [
    (1.1, "blur_1.100000"), (1.5, "blur_1.500000"),
    (0.586, "blur_0.586000"), (0.4, "blur_0.400000"),
    (4.53358927369, "blur_4.533589"), (9.65781083553, "blur_9.657811"),
    (14.2644604355, "blur_14.264460"), (8.8510880283, "blur_8.851088"),
])
def test_blur(size, sigma, tag):
    w, h = size
    ref = load_f32(f"{w}x{h}_{tag}.f32", (h, w))
    got = blur(_lin(w, h)[1], sigma, 0.0)
    _rel_close(got, ref, 2e-4, 2e-3)


def test_blur_border_ratio(size):
    w, h = size
    ref = load_f32(f"{w}x{h}_blur_diffmap_border.f32", (h, w))
    got = blur(_lin(w, h)[1], 8.8510880283, 0.03027655136)
    _rel_close(got, ref, 2e-4, 2e-3)


def test_opsin_dynamics(size):
    w, h = size
    for which in (0, 1):
        ref = load_f32(f"{w}x{h}_xyb{which}.f32", (3, h, w))
        got = opsin_dynamics_image(_lin(w, h, which))
        _rel_close(got, ref, 5e-4, 5e-3)


def _mhic(w, h):
    xyb0 = load_f32(f"{w}x{h}_xyb0.f32", (3, h, w))
    xyb1 = load_f32(f"{w}x{h}_xyb1.f32", (3, h, w))
    return dm.mask_high_intensity_change(xyb0, xyb1)


def test_mask_high_intensity_change(size):
    w, h = size
    m0, m1 = _mhic(w, h)
    _rel_close(m0, load_f32(f"{w}x{h}_mhic0.f32", (3, h, w)), 2e-4, 2e-3)
    _rel_close(m1, load_f32(f"{w}x{h}_mhic1.f32", (3, h, w)), 2e-4, 2e-3)


def test_mask(size):
    w, h = size
    m0 = load_f32(f"{w}x{h}_mhic0.f32", (3, h, w))
    m1 = load_f32(f"{w}x{h}_mhic1.f32", (3, h, w))
    mask, mask_dc = dm.mask(m0, m1)
    _rel_close(mask, load_f32(f"{w}x{h}_mask.f32", (3, h, w)), 2e-3, 2e-3)
    _rel_close(mask_dc, load_f32(f"{w}x{h}_mask_dc.f32", (3, h, w)),
               2e-3, 2e-3)


def _res_grid(w, h, step=3):
    return -(-w // step), -(-h // step)


def test_edge_detector_map(size):
    w, h = size
    rx, ry = _res_grid(w, h)
    ref = load_f32(f"{w}x{h}_edge_map.f32", (ry, rx, 3))
    m0 = load_f32(f"{w}x{h}_mhic0.f32", (3, h, w))
    m1 = load_f32(f"{w}x{h}_mhic1.f32", (3, h, w))
    got = np.asarray(dm.edge_detector_map(m0, m1))
    ny, nx = got.shape[:2]
    _rel_close(got, ref[:ny, :nx], 5e-4, 5e-4)
    # entries beyond the loop range stay zero in the reference
    assert np.all(ref[ny:] == 0) and np.all(ref[:, nx:] == 0)


def test_block_diff_map(size):
    w, h = size
    rx, ry = _res_grid(w, h)
    ref_dc = load_f32(f"{w}x{h}_block_dc.f32", (ry, rx, 3))
    ref_ac = load_f32(f"{w}x{h}_block_ac.f32", (ry, rx, 3))
    m0 = load_f32(f"{w}x{h}_mhic0.f32", (3, h, w))
    m1 = load_f32(f"{w}x{h}_mhic1.f32", (3, h, w))
    dc, ac = dm.block_diff_map(m0, m1)
    dc, ac = np.asarray(dc), np.asarray(ac)
    ny, nx = dc.shape[:2]
    _rel_close(dc, ref_dc[:ny, :nx], 1e-3, 1e-3)
    _rel_close(ac, ref_ac[:ny, :nx], 1e-3, 1e-3)


def test_edge_detector_low_freq(size):
    w, h = size
    rx, ry = _res_grid(w, h)
    ref = load_f32(f"{w}x{h}_block_ac_lf.f32", (ry, rx, 3))
    m0 = load_f32(f"{w}x{h}_mhic0.f32", (3, h, w))
    m1 = load_f32(f"{w}x{h}_mhic1.f32", (3, h, w))
    _, ac = dm.block_diff_map(m0, m1)
    got = np.asarray(dm.edge_detector_low_freq(m0, m1, ac))
    ny, nx = got.shape[:2]
    _rel_close(got, ref[:ny, :nx], 1e-3, 1e-3)


def test_blockdiff_8x8(size):
    w, h = size
    if w < 16 or h < 16:
        pytest.skip("fixture only for larger image")
    ref = load_f32(f"{w}x{h}_blockdiff.f32", (4, 3, 3))
    m0 = load_f32(f"{w}x{h}_mhic0.f32", (3, h, w))
    m1 = load_f32(f"{w}x{h}_mhic1.f32", (3, h, w))
    blocks0, blocks1 = [], []
    for bi in range(4):
        bx, by = (bi % 2) * 8, (bi // 2) * 8
        blocks0.append(m0[:, by:by + 8, bx:bx + 8].reshape(3, 64))
        blocks1.append(m1[:, by:by + 8, bx:bx + 8].reshape(3, 64))
    dc, ac, edge = bd.block_diff(np.stack(blocks0), np.stack(blocks1))
    got = np.stack([np.asarray(dc), np.asarray(ac), np.asarray(edge)],
                   axis=1)
    _rel_close(got, ref, 1e-3, 1e-3)


def test_full_diffmap_and_score(size):
    w, h = size
    xyb0 = load_f32(f"{w}x{h}_xyb0.f32", (3, h, w))
    xyb1 = load_f32(f"{w}x{h}_xyb1.f32", (3, h, w))
    ref = load_f32(f"{w}x{h}_diffmap.f32", (h, w))
    ref_score = load_f32(f"{w}x{h}_score.f32", (1,))[0]
    got = np.asarray(dm.diffmap_opsin_dynamics(xyb0, xyb1))
    _rel_close(got, ref, 2e-3, 2e-3)
    score = float(dm.score_from_diffmap(got))
    assert abs(score - ref_score) < 2e-3 * max(1.0, ref_score)
