"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from guetzli_tpu.ops.blur import blur
from guetzli_tpu.parallel import corpus, halo


def test_sharded_blur_exact():
    """ppermute halo-exchange blur must match the single-device blur
    bit-for-bit (the zero-fill of missing neighbors reproduces the
    out-of-image-taps-are-zero border semantics)."""
    n = len(jax.devices())
    mesh = jax.sharding.Mesh(np.asarray(jax.devices()), ("tile",))
    h, w = 8 * n, 40
    rng = np.random.RandomState(0)
    img = rng.rand(h, w).astype(np.float32) * 255.0

    for sigma, br in [(1.1, 0.0), (1.5, 0.0), (2.0, 0.3)]:
        want = np.asarray(blur(jnp.asarray(img), sigma, br))
        got = np.asarray(halo.sharded_blur(jnp.asarray(img), sigma, br,
                                           mesh))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


def test_sharded_search_step_matches_single_device():
    """The sharded corpus search step must agree with unsharded eval."""
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(len(jax.devices()))


def test_mesh_factoring():
    mesh = corpus.make_mesh(8)
    assert mesh.shape["batch"] * mesh.shape["tile"] == 8
    mesh1 = corpus.make_mesh(1)
    assert mesh1.shape["batch"] == 1 and mesh1.shape["tile"] == 1


def test_encode_corpus_threads_match_sequential():
    """Threaded corpus encoding must produce the same bytes as
    sequential (device work is deterministic; only scheduling differs)."""
    import pathlib

    from guetzli_tpu.parallel.api import encode_corpus
    fix = pathlib.Path(__file__).parent / "fixtures"
    data = (fix / "bees96x64.png").read_bytes()
    items = [(f"img{i}", data) for i in range(3)]
    seq = encode_corpus(items, quality=95, threads=1)
    par = encode_corpus(items, quality=95, threads=3)
    for (n1, b1, _), (n2, b2, _) in zip(seq, par):
        assert b1 is not None and b1 == b2, (n1, n2)
