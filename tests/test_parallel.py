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


def test_sharded_search_step_numerics():
    """The mesh-sharded search step must reproduce single-device scores
    and zeroing evaluations (XLA SPMD partitioning is semantics-
    preserving; this pins it)."""
    from functools import partial

    import jax.numpy as jnp

    from guetzli_tpu.codec.encoder import encode_rgb_to_jpeg
    from guetzli_tpu.comparator import Comparator
    from guetzli_tpu.ops.opsin import opsin_dynamics_image
    from guetzli_tpu import consts

    rng = np.random.RandomState(7)
    w, h = 32, 8 * len(jax.devices())
    b = 2
    lut = consts.SRGB_TO_LINEAR.astype(np.float32)

    coeffs = np.zeros((b, 3, (w // 8) * (h // 8), 64), dtype=np.int32)
    xyb0 = np.zeros((b, 3, h, w), dtype=np.float32)
    tiles = np.zeros((b, (w // 8) * (h // 8), 3, 64), dtype=np.float32)
    scales = np.zeros((b, (w // 8) * (h // 8), 3), dtype=np.float32)
    ysels = np.zeros((b, (w // 8) * (h // 8), 8), dtype=np.int32)
    xsels = np.zeros((b, (w // 8) * (h // 8), 8), dtype=np.int32)
    for i in range(b):
        rgb = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        jpg = encode_rgb_to_jpeg(rgb, w, h)
        coeffs[i] = np.stack([c.coeffs.astype(np.int32)
                              for c in jpg.components])
        xyb0[i] = np.asarray(opsin_dynamics_image(
            jnp.asarray(lut[rgb].transpose(2, 0, 1))))
        comp = Comparator(rgb, w, h, 1.0)
        comp.start_block_comparisons()
        t, s, ysel, xsel = comp.block_state(1, 1)
        tiles[i], scales[i] = np.asarray(t), np.asarray(s)
        ysels[i], xsels[i] = np.asarray(ysel), np.asarray(xsel)

    mesh = corpus.make_mesh(len(jax.devices()))
    step, shardings = corpus.make_search_step(
        mesh, w // 8, h // 8, w, h)
    args = [jax.device_put(a, s) for a, s in zip(
        (coeffs, coeffs.copy(), xyb0, tiles, scales, ysels, xsels,
         np.float32(1.0)), shardings)]
    scores_sharded, new_coeffs_sharded, errs_sharded = step(*args)

    # Single-device reference.
    for i in range(b):
        s1, _ = corpus._compare_one(jnp.asarray(coeffs[i]),
                                    jnp.asarray(xyb0[i]),
                                    bw=w // 8, bh=h // 8, w=w, h=h)
        # SPMD partitioning reorders float accumulations; the reference's
        # own GPU-vs-CPU harness uses 1e-3 (clguetzli_test.cpp:21-36).
        np.testing.assert_allclose(float(scores_sharded[i]), float(s1),
                                   rtol=1e-3, atol=1e-3)
        nbt = np.transpose(coeffs[i], (1, 0, 2))     # [NB, 3, 64]
        nc1, errs1 = corpus._zeroing_eval_one(
            jnp.asarray(nbt), jnp.asarray(nbt),
            jnp.asarray(tiles[i]), jnp.asarray(scales[i]),
            jnp.asarray(ysels[i]), jnp.asarray(xsels[i]),
            jnp.float32(1.0))
        np.testing.assert_allclose(np.asarray(errs_sharded[i]),
                                   np.asarray(errs1), rtol=1e-3, atol=1e-3)


def test_zeroing_per_block_limits_match_separate_runs():
    """Lockstep-batching foundation: blocks of two images concatenated with
    a per-block limit vector must produce bit-identical zeroing orders to
    two separate single-image runs (NOTES.md lockstep design, step 3)."""
    import numpy as np

    from tests.conftest import FIXTURES

    from guetzli_tpu.codec.encoder import encode_rgb_to_jpeg
    from guetzli_tpu.comparator import Comparator
    from guetzli_tpu.io.png import read_png
    from guetzli_tpu.search import zeroing

    def inputs(name, qv):
        rgb, w, h = read_png((FIXTURES / name).read_bytes())
        jpg = encode_rgb_to_jpeg(
            rgb, w, h, quant=np.full((3, 64), qv, dtype=np.int32))
        blocks = np.transpose(
            np.stack([c.coeffs.astype(np.int32) * qv
                      for c in jpg.components]), (1, 0, 2)).copy()
        comp = Comparator(rgb, w, h, 1.0)
        comp.start_block_comparisons()
        aux = tuple(np.asarray(a) for a in comp.block_state(1, 1))
        return blocks, aux

    blocks_a, aux_a = inputs("bees96x64.png", 16)
    blocks_b, aux_b = inputs("synth128x96.png", 24)
    lim_a, lim_b = np.float32(0.6), np.float32(1.3)

    run = zeroing.compute_zeroing_order_staged
    sep_a = run(blocks_a, blocks_a, lim_a, aux_a, "444", 7)
    sep_b = run(blocks_b, blocks_b, lim_b, aux_b, "444", 7)

    cat_blocks = np.concatenate([blocks_a, blocks_b])
    cat_aux = tuple(np.concatenate([a, b])
                    for a, b in zip(aux_a, aux_b))
    limits = np.concatenate([
        np.full(len(blocks_a), lim_a, np.float32),
        np.full(len(blocks_b), lim_b, np.float32)])
    cat = run(cat_blocks, cat_blocks, limits, cat_aux, "444", 7)

    na = len(blocks_a)
    for i, (sa, sb) in enumerate(zip(sep_a, sep_b)):
        np.testing.assert_array_equal(cat[i][:na], sa, err_msg=f"A[{i}]")
        np.testing.assert_array_equal(cat[i][na:], sb, err_msg=f"B[{i}]")
