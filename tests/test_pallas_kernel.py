"""Pallas fused tile-compare vs the XLA reference pipeline (the checkcl
dual-execution pattern, SURVEY.md §4.3)."""

import numpy as np
import pytest

from tests.conftest import FIXTURES

from guetzli_tpu.comparator import Comparator
from guetzli_tpu.io.png import read_png
from guetzli_tpu.kernels import tile_compare as tc
from guetzli_tpu.ops import tiles as tile_ops


@pytest.fixture(scope="module")
def setup():
    import jax.numpy as jnp

    from guetzli_tpu.codec.encoder import encode_rgb_to_jpeg
    with open(FIXTURES / "bees96x64.png", "rb") as f:
        rgb, w, h = read_png(f.read())
    jpg = encode_rgb_to_jpeg(
        rgb, w, h, quant=np.full((3, 64), 3, dtype=np.int32))
    coeffs = np.stack([c.coeffs.astype(np.int32) * 3
                       for c in jpg.components])
    comp = Comparator(rgb, w, h, 1.0)
    comp.start_block_comparisons()
    xyb0_tiles, scales, ysel, xsel = comp.block_state(1, 1)
    cand = np.transpose(coeffs, (1, 0, 2))          # [NB, 3, 64]
    return cand, xyb0_tiles, scales, ysel, xsel


def _pad(a, n):
    pad = n - a.shape[0]
    return np.concatenate([np.asarray(a),
                           np.zeros((pad,) + a.shape[1:], a.dtype)])


def test_pallas_matches_xla(setup):
    import jax.numpy as jnp
    cand, xyb0_tiles, scales, ysel, xsel = setup
    nb = cand.shape[0]

    want = np.asarray(tile_ops.compare_blocks(
        xyb0_tiles,
        tile_ops.tiles_to_linear_rgb(jnp.asarray(cand), xsel, ysel),
        scales))

    n = ((nb + tc.TILE - 1) // tc.TILE) * tc.TILE
    sy, sx = tc._selection_matrices(ysel, xsel)
    got = np.asarray(tc.tile_compare_pallas(
        jnp.asarray(_pad(cand, n)),
        jnp.asarray(_pad(np.asarray(xyb0_tiles), n)),
        jnp.asarray(_pad(np.asarray(scales), n)),
        jnp.asarray(_pad(sy, n)), jnp.asarray(_pad(sx, n)),
        interpret=True))[:nb]

    # The kernel computes sRGB->linear arithmetically instead of through
    # the double-precision LUT; the amplification through the opsin
    # sensitivity keeps differences under ~1e-3 -- the same tolerance band
    # as the reference-vs-JAX stage parity tests.
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_pallas_lanes_matches_xla(setup):
    """The lane-major fused kernel (kernels/tile_compare_lanes.py) vs the
    XLA lane-major path, interpret mode. Interpret executes op-by-op
    (every intermediate rounds at op boundaries), so agreement is in the
    same ~1e-3 band as the blocks-leading kernel test above."""
    import jax.numpy as jnp

    from guetzli_tpu.kernels import tile_compare_lanes as tcl
    from guetzli_tpu.ops import tiles_lanes as tl

    cand, xyb0_tiles, scales, ysel, xsel = setup
    nb = cand.shape[0]

    aux_t = tl.transpose_aux_444(xyb0_tiles, scales, ysel, xsel)
    want = np.asarray(tl.compare_blocks_lanes444(jnp.asarray(cand),
                                                 *aux_t))

    n = ((nb + tcl.TILE_N - 1) // tcl.TILE_N) * tcl.TILE_N
    got = np.asarray(tcl.tile_compare_pallas_lanes(
        jnp.asarray(_pad(cand, n)),
        jnp.asarray(_pad(np.asarray(xyb0_tiles), n)),
        jnp.asarray(_pad(np.asarray(scales), n)),
        jnp.asarray(_pad(np.asarray(ysel), n)),
        jnp.asarray(_pad(np.asarray(xsel), n)),
        interpret=True))[:nb]
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=2e-3)


def test_zeroing_mode_444pl_matches_444l(setup):
    """The production zeroing driver with mode '444pl' (fused lane-major
    Pallas kernel, GUETZLI_TPU_PALLAS=2) reproduces the '444l' XLA path's
    zeroing order on the same inputs (interpret mode on CPU). The order
    is argmin-driven, so agreement here is stronger than elementwise
    tolerance: every greedy decision must match."""
    import jax.numpy as jnp

    from guetzli_tpu.search import zeroing

    cand, xyb0_tiles, scales, ysel, xsel = setup
    blocks = jnp.asarray(cand)
    aux = (jnp.asarray(xyb0_tiles), jnp.asarray(scales),
           jnp.asarray(ysel), jnp.asarray(xsel))
    limit = jnp.float32(1.0)
    idx_l, err_l, num_l = zeroing.compute_zeroing_order_with(
        blocks, blocks, limit, aux, "444l", 7, lookahead=3)
    idx_p, err_p, num_p = zeroing.compute_zeroing_order_with(
        blocks, blocks, limit, aux, "444pl", 7, lookahead=3)
    # Primary: decisions and counts agree exactly (they do on this
    # backend). Fallback: a near-tie argmin may flip on last-ulp
    # differences between XLA fusion and the interpreted kernel, so a
    # disagreeing decision is only a failure if the two paths' errors at
    # that step are NOT a tie within float32 noise.
    el, ep = np.asarray(err_l), np.asarray(err_p)
    nl = np.asarray(num_l)
    npn = np.asarray(num_p)
    if not np.array_equal(nl, npn):
        flip = nl != npn
        np.testing.assert_allclose(el[flip], ep[flip], rtol=1e-6,
                                   atol=1e-6)
    il, ip = np.asarray(idx_l), np.asarray(idx_p)
    for b in range(il.shape[0]):
        n = min(nl[b], npn[b])
        bad = il[b, :n] != ip[b, :n]
        if bad.any():
            np.testing.assert_allclose(el[b, :n][bad], ep[b, :n][bad],
                                       rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(el, ep, rtol=5e-3, atol=2e-3)
