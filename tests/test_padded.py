"""Shape-bucket (padded geometry) parity: the dynamic-size programs must
reproduce the static per-geometry pipeline at every valid pixel, for any
actual size inside the bucket (ops/padgeom.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from guetzli_tpu import consts
from guetzli_tpu.ops import diffmap as dm
from guetzli_tpu.ops import opsin as ops_opsin
from guetzli_tpu.ops.padgeom import PadGeom, bucket_dim


def _rand_lin(w, h, seed):
    rng = np.random.RandomState(seed)
    lut = consts.SRGB_TO_LINEAR.astype(np.float32)
    return lut[rng.randint(0, 256, size=(3, h, w))]


SIZES = [(96, 64), (91, 57), (100, 33), (65, 65)]


def test_bucket_dim():
    assert bucket_dim(1) == 32
    assert bucket_dim(33) == 64
    assert bucket_dim(256) == 256
    assert bucket_dim(257) == 288
    assert bucket_dim(513) == 576
    assert bucket_dim(1025) == 1152
    for n in (32, 96, 250, 1000, 4000):
        assert bucket_dim(n) >= n and bucket_dim(n) % 16 == 0


@pytest.mark.parametrize("w,h", SIZES)
def test_padded_diffmap_matches_static(w, h):
    lin0 = _rand_lin(w, h, seed=w * 1000 + h)
    lin1 = _rand_lin(w, h, seed=w * 1000 + h + 1)

    xyb0 = ops_opsin.opsin_dynamics_image(jnp.asarray(lin0))
    xyb1 = ops_opsin.opsin_dynamics_image(jnp.asarray(lin1))
    want = np.asarray(dm.diffmap_opsin_dynamics(xyb0, xyb1))
    want_score = float(dm.score_from_diffmap(jnp.asarray(want)))

    g = PadGeom(w, h)
    sc = {k: (jnp.asarray(v[0]), jnp.asarray(v[1]))
          for k, v in g.scales().items()}
    wd, hd = jnp.int32(w), jnp.int32(h)
    p0 = jnp.asarray(g.pad_plane(lin0))
    p1 = jnp.asarray(g.pad_plane(lin1))
    xyb0p = ops_opsin.opsin_dynamics_image_dyn(p0, wd, hd, sc)
    xyb1p = ops_opsin.opsin_dynamics_image_dyn(p1, wd, hd, sc)

    # Opsin parity at valid pixels.
    np.testing.assert_allclose(np.asarray(xyb0p)[:, :h, :w],
                               np.asarray(xyb0), rtol=0, atol=0)

    got_full = np.asarray(dm.diffmap_opsin_dynamics_dyn(
        xyb0p, xyb1p, wd, hd, sc))
    got = got_full[:h, :w]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # Outside the valid region the padded diffmap is exactly zero, so the
    # padded score is a plain max.
    assert np.all(got_full[h:] == 0.0) and np.all(got_full[:, w:] == 0.0)
    got_score = float(dm.score_from_diffmap(jnp.asarray(got_full)))
    assert got_score == pytest.approx(want_score, rel=1e-6)


def test_padded_program_shared_across_sizes():
    """Two different sizes in the same bucket must hit the same compiled
    program (the whole point of bucketing)."""
    traces = []
    for (w, h) in ((96, 64), (91, 57)):
        g = PadGeom(w, h)
        traces.append((g.wp, g.hp))
    assert traces[0] == traces[1]
