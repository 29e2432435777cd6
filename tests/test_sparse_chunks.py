"""Chunked sparse coefficient-delta dispatch: a wave larger than the top
fused rung must be applied through fixed-size scatter-only chunks with
results identical to a fresh full compare of the same host state."""

import numpy as np

from tests.conftest import FIXTURES

from guetzli_tpu.comparator import Comparator
from guetzli_tpu.io.png import read_png
from guetzli_tpu.search import state as st
from guetzli_tpu.codec.encoder import encode_rgb_to_jpeg


def test_chunked_sparse_coeffs_matches_full(monkeypatch):
    rgb, w, h = read_png((FIXTURES / "bees96x64.png").read_bytes())
    jpg = encode_rgb_to_jpeg(rgb, w, h)
    st.remove_original_quantization(jpg)
    img = st.CoeffImage.from_jpeg(jpg)
    comp = Comparator(rgb, w, h, 1.0)
    comp.backend_sync_full(img)

    # Flip a large spread of coefficients on the host image.
    rng = np.random.RandomState(3)
    nb = img.bw * img.bh
    m = 500
    bs = rng.randint(0, nb, m).astype(np.int64)
    cks = (rng.randint(0, 3, m) * 64 + rng.randint(1, 64, m)).astype(
        np.int64)
    for c in range(3):
        sel = (cks >> 6) == c
        img.comps[c].coeffs[bs[sel], cks[sel] & 63] = 0
    vals = np.zeros(m, np.int32)

    # Force the chunked path: tiny rungs, chunk of 128.
    monkeypatch.setattr(Comparator, "_SPARSE_COEFF_SIZES", (64, 128))
    monkeypatch.setattr(Comparator, "_SPARSE_COEFF_CHUNK", 128)
    handle = comp.dispatch_compare_sparse_coeffs(
        img, bs, cks, vals, 1, 1.0, 1, 1)
    d_sparse, w4_sparse = comp.fetch_compare(handle)

    # Fresh comparator, plain full compare of the same host state.
    comp2 = Comparator(rgb, w, h, 1.0)
    d_full, w4_full = comp2.compare_img_with_weights(img, 1, 1.0, 1, 1)

    assert abs(d_sparse - d_full) < 1e-5, (d_sparse, d_full)
    np.testing.assert_allclose(w4_sparse, w4_full, rtol=1e-6, atol=1e-6)
