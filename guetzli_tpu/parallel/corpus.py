"""Multi-chip sharded search steps: corpus data-parallelism + tile
parallelism.

The reference encodes one image per process on one accelerator; its test
harness fans out with `xargs -P` (golden_test.sh:25). The TPU-native
equivalents here:

  * corpus DP  -- a batch of same-geometry images sharded over a `batch`
    mesh axis; every search stage (full diffmap compare, per-block zeroing
    evaluation) is vmapped over the batch and partitioned by XLA SPMD.
  * tile parallelism -- image rows and DCT blocks additionally sharded over
    a `tile` axis; XLA inserts the halo collectives for the blur
    convolutions (the explicit ppermute version lives in parallel/halo.py),
    and the final score max / size stats ride psum/pmax over ICI.

`search_step` is the jit unit the driver dry-runs: one full-image compare +
one greedy zeroing evaluation for every image in the batch, with real
shardings over a ('batch', 'tile') mesh.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from guetzli_tpu.ops import diffmap as dm
from guetzli_tpu.ops import image as img_ops
from guetzli_tpu.ops import tiles as tile_ops
from guetzli_tpu.ops.opsin import opsin_dynamics_image
from guetzli_tpu.search import zeroing


def make_mesh(n_devices, batch=None):
    """('batch', 'tile') mesh over the first n devices."""
    avail = jax.devices()
    if len(avail) < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices but only {len(avail)} available; "
            "for CPU simulation set XLA_FLAGS="
            "--xla_force_host_platform_device_count=N and JAX_PLATFORMS=cpu")
    if batch is None:
        batch = 2 if n_devices % 2 == 0 and n_devices > 1 else 1
    tile = n_devices // batch
    devices = np.asarray(avail[:n_devices]).reshape(batch, tile)
    return jax.sharding.Mesh(devices, ("batch", "tile"))


def _compare_one(coeffs, xyb0, bw, bh, w, h):
    lin = img_ops.coeffs_to_linear_rgb(coeffs, bw, bh, w, h)
    xyb1 = opsin_dynamics_image(lin)
    dmap = dm.diffmap_opsin_dynamics(xyb0, xyb1)
    return dm.score_from_diffmap(dmap), dmap


def _zeroing_eval_one(coeffs_t, orig_t, xyb0_tiles, scales, ysel, xsel,
                      limit):
    """One lookahead-3 greedy zeroing evaluation round for every block of
    one image (the body of search/zeroing.py's while_loop, unrolled once --
    the dry-run exercises the sharded evaluation path, the production loop
    wraps it in lax.while_loop)."""
    nb = coeffs_t.shape[0]
    scores = zeroing.candidate_scores(coeffs_t, orig_t, 7)
    order = jnp.argsort(scores, axis=1).astype(jnp.int32)[:, :3]
    flat = coeffs_t.reshape(nb, zeroing.K)
    cand = flat[:, None, :] * (1 - jax.nn.one_hot(order, zeroing.K,
                                                  dtype=jnp.int32))
    cand = cand.reshape(nb * 3, 3, 64)
    lin = tile_ops.tiles_to_linear_rgb(
        cand, jnp.repeat(xsel, 3, axis=0), jnp.repeat(ysel, 3, axis=0))
    errs = tile_ops.compare_blocks(
        jnp.repeat(xyb0_tiles, 3, axis=0), lin,
        jnp.repeat(scales, 3, axis=0)).reshape(nb, 3)
    best_l = jnp.argmin(errs, axis=1)
    best_idx = jnp.take_along_axis(order, best_l[:, None], axis=1)[:, 0]
    keep = jnp.min(errs, axis=1) <= limit
    zero_mask = jax.nn.one_hot(best_idx, zeroing.K, dtype=jnp.int32)
    new_flat = jnp.where(keep[:, None], flat * (1 - zero_mask), flat)
    return new_flat.reshape(nb, 3, 64), errs


def make_search_step(mesh, bw, bh, w, h):
    """Jitted sharded search step over a batch of images.

    Inputs (leading batch axis sharded on 'batch'):
      coeffs  [B, 3, NB, 64]  int32, NB additionally sharded on 'tile'
      orig    [B, 3, NB, 64]  int32
      xyb0    [B, 3, H, W]    float32, H sharded on 'tile'
      xyb0_tiles [B, NB, 3, 64] (flat tile storage), scales [B, NB, 3],
      ysel/xsel [B, NB, 8], limit scalar
    Returns (scores [B], new_coeffs, block_errs).
    """
    in_shardings = (
        NamedSharding(mesh, P("batch", None, "tile", None)),   # coeffs
        NamedSharding(mesh, P("batch", None, "tile", None)),   # orig
        NamedSharding(mesh, P("batch", None, "tile", None)),   # xyb0 (H)
        NamedSharding(mesh, P("batch", "tile", None, None)),
        NamedSharding(mesh, P("batch", "tile", None)),
        NamedSharding(mesh, P("batch", "tile", None)),
        NamedSharding(mesh, P("batch", "tile", None)),
        NamedSharding(mesh, P()),
    )

    def step(coeffs, orig, xyb0, xyb0_tiles, scales, ysel, xsel, limit):
        nbt = jnp.transpose(coeffs, (0, 2, 1, 3))   # [B, NB, 3, 64]
        nbo = jnp.transpose(orig, (0, 2, 1, 3))
        scores, _ = jax.vmap(
            partial(_compare_one, bw=bw, bh=bh, w=w, h=h))(coeffs, xyb0)
        new_coeffs, errs = jax.vmap(
            partial(_zeroing_eval_one, limit=limit))(
                nbt, nbo, xyb0_tiles, scales, ysel, xsel)
        return scores, new_coeffs, errs

    return jax.jit(step, in_shardings=in_shardings), in_shardings
