"""Production mesh-sharded encode (parallel/mesh.py): one image encoded
over an 8-device ('tile',) mesh must be byte-identical to the
single-device encode.

This is the end-to-end proof that XLA GSPMD partitions the full search —
opsin, every blur sigma (including the sigma>=3 step-subsampled blurs
whose ~32 px halos ride the inserted collectives), edge/mask/diffmap,
the score max all-reduce, and the zeroing while_loop over the sharded
block axis — without changing a single output bit.
"""

import numpy as np
import pytest

import jax

from tests.conftest import FIXTURES


needs_mesh = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices")


@needs_mesh
def test_mesh_encode_444_byte_identical(monkeypatch):
    from guetzli_tpu.parallel.api import encode_bytes

    data = (FIXTURES / "bees96x64.png").read_bytes()
    monkeypatch.delenv("GUETZLI_TPU_MESH", raising=False)
    single = encode_bytes(data, quality=95)
    monkeypatch.setenv("GUETZLI_TPU_MESH", "8")
    mesh = encode_bytes(data, quality=95)
    assert mesh == single


@needs_mesh
def test_mesh_encode_odd_geometry_420(monkeypatch):
    """Odd geometry (padded grid != real grid) through the 420 pass:
    sharded uploads of the Y/chroma coefficient grids and the 420
    aux state must not change output bytes."""
    from guetzli_tpu import consts
    from guetzli_tpu.io.png import read_png
    from guetzli_tpu.search.processor import (Params, ProcessStats,
                                              process_rgb)

    data = (FIXTURES / "bees97x63.png").read_bytes()
    rgb, w, h = read_png(data)

    def enc():
        params = Params(force_420=True)
        params.butteraugli_target = consts.butteraugli_score_for_quality(
            95)
        return process_rgb(params, rgb, w, h, ProcessStats())

    monkeypatch.delenv("GUETZLI_TPU_MESH", raising=False)
    single = enc()
    monkeypatch.setenv("GUETZLI_TPU_MESH", "8")
    mesh = enc()
    assert mesh == single


@needs_mesh
def test_mesh_compare_matches_single(monkeypatch):
    """Unit-level: the fused compare+weights on sharded inputs returns the
    exact same score/weights as on replicated inputs."""
    from guetzli_tpu import consts
    from guetzli_tpu.comparator import Comparator
    from guetzli_tpu.io.png import read_png
    from guetzli_tpu.parallel.mesh import tile_mesh
    from guetzli_tpu.search import state as st
    from guetzli_tpu.codec.encoder import encode_rgb_to_jpeg

    data = (FIXTURES / "synth128x96.png").read_bytes()
    rgb, w, h = read_png(data)
    target = consts.butteraugli_score_for_quality(90)
    jpg = encode_rgb_to_jpeg(rgb, w, h)
    st.remove_original_quantization(jpg)
    img = st.CoeffImage.from_jpeg(jpg)

    monkeypatch.delenv("GUETZLI_TPU_MESH", raising=False)
    c1 = Comparator(rgb, w, h, target)
    d1, w41 = c1.compare_img_with_weights(img, 1, 1.0, 1, 1)
    c2 = Comparator(rgb, w, h, target, mesh=tile_mesh(8))
    d2, w42 = c2.compare_img_with_weights(img, 1, 1.0, 1, 1)
    assert d1 == d2
    np.testing.assert_array_equal(w41, w42)
