"""Device-side CSR compaction vs the full-rail staged path.

compute_zeroing_csr_staged must reproduce, bit-for-bit, the candidate
arrays that csr_from_zeroing builds from compute_zeroing_order_staged's
pulled [NB, 192] rails -- including bucket-padding row removal
(real_index) and per-block limit vectors (lockstep concatenation).
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


def _reference_csr(out_idx, out_err, num, nb, limit):
    """csr_from_zeroing's selection (processor.cc:694-716) inline."""
    slot = np.arange(out_err.shape[1])[None, :]
    sel = ((slot < num[:, None]) & (out_err > 0) & (out_err <= limit))
    counts = sel.sum(axis=1)
    offsets = np.zeros(nb + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return (offsets, out_idx[sel].astype(np.int32),
            out_err[sel].astype(np.float32))


@pytest.mark.parametrize("limit", [0.8, 2.5])
def test_csr_matches_full_rails(setup, limit):
    cand, aux = setup
    import jax.numpy as jnp
    aux_dev = tuple(jnp.asarray(a) for a in aux)
    nb = cand.shape[0]

    oi, oe, nn = zeroing.compute_zeroing_order_staged(
        cand, cand, np.float32(limit), aux_dev, "444l", 7)
    want = _reference_csr(oi, oe, nn, nb, np.float32(limit))

    got = zeroing.compute_zeroing_csr_staged(
        cand, cand, np.float32(limit), aux_dev, "444l", 7)

    np.testing.assert_array_equal(want[0], got[0])
    np.testing.assert_array_equal(want[1], got[1])
    np.testing.assert_array_equal(want[2], got[2])


def test_csr_real_index_and_vector_limit(setup):
    """Concatenate the corpus twice with different per-image limits and
    a fake bucket padding: the compacted CSR must equal per-image
    full-rail CSRs."""
    cand, aux = setup
    import jax.numpy as jnp
    nb = cand.shape[0]
    # Fake bucket: pad each image's block axis by 7 junk rows.
    pad = 7
    cand_p = np.concatenate(
        [cand, np.zeros((pad, 3, 64), cand.dtype)])
    aux_p = tuple(
        np.concatenate([np.asarray(a),
                        np.zeros((pad,) + np.asarray(a).shape[1:],
                                 np.asarray(a).dtype)])
        for a in aux)
    limits = [0.9, 2.0]
    cat = np.concatenate([cand_p, cand_p])
    cat_aux = tuple(jnp.asarray(np.concatenate([a, a])) for a in aux_p)
    lim_vec = np.concatenate([
        np.full(nb + pad, limits[0], np.float32),
        np.full(nb + pad, limits[1], np.float32)])
    # Real rows: identity within each image (padding rows at the end).
    real_index = np.concatenate([
        np.arange(nb, dtype=np.int64),
        (nb + pad) + np.arange(nb, dtype=np.int64)])

    got = zeroing.compute_zeroing_csr_staged(
        cat, cat, lim_vec, cat_aux, "444l", 7, real_index=real_index)

    aux_dev = tuple(jnp.asarray(a) for a in aux)
    row0 = 0
    for lim in limits:
        oi, oe, nn = zeroing.compute_zeroing_order_staged(
            cand, cand, np.float32(lim), aux_dev, "444l", 7)
        want = _reference_csr(oi, oe, nn, nb, np.float32(lim))
        offsets = got[0][row0:row0 + nb + 1] - got[0][row0]
        lo, hi = got[0][row0], got[0][row0 + nb]
        np.testing.assert_array_equal(want[0], offsets)
        np.testing.assert_array_equal(want[1], got[1][lo:hi])
        np.testing.assert_array_equal(want[2], got[2][lo:hi])
        row0 += nb
