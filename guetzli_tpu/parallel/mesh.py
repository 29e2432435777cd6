"""Production single-image sharding: a 1-D `tile` device mesh.

The reference's accelerator backends run one image on one GPU
(clguetzli/ocl.cpp); there is no multi-device story to translate, so this
layer is TPU-native by construction. One image's encode is partitioned
over chips by XLA GSPMD: image planes shard by rows, per-block arrays
shard by blocks, and every existing bucket-shaped jit (fused
compare+weights, zeroing while_loop) runs unmodified — jit sees sharded
operands and partitions the program, inserting halo collectives for the
blur convolutions and an all-reduce for the final score max
(scaling-book recipe: annotate shardings, let XLA insert collectives).

Numerics: partitioned convolutions evaluate each output element over the
same taps in the same order as the single-device program, and the score
reduction is a max, so sharded encodes are byte-identical to
single-device encodes (tests/test_mesh_encode.py asserts this).

Enable with `--mesh N` on the CLI or GUETZLI_TPU_MESH=N.
"""

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def tile_mesh(n_devices: int) -> Mesh:
    """1-D ('tile',) mesh over the first n devices."""
    avail = jax.devices()
    if len(avail) < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices but only {len(avail)} available; "
            "for CPU simulation set XLA_FLAGS="
            "--xla_force_host_platform_device_count=N JAX_PLATFORMS=cpu")
    return Mesh(np.asarray(avail[:n_devices]), ("tile",))


def mesh_from_env():
    """Mesh from GUETZLI_TPU_MESH=N (None when unset/1)."""
    from guetzli_tpu import config
    n = config.current().mesh
    if n <= 1:
        return None
    return tile_mesh(n)


def plane_sharding(mesh):
    """[..., H, W] planes: shard rows (H) over 'tile'."""
    return NamedSharding(mesh, P(None, "tile", None))


def blocks_sharding(mesh):
    """[NB, ...] per-block arrays: shard the block axis over 'tile'."""
    return NamedSharding(mesh, P("tile"))


def put_blocks(mesh, a):
    """Upload a host per-block array sharded over the mesh (single-device
    jnp.asarray otherwise)."""
    import jax.numpy as jnp
    if mesh is None:
        return jnp.asarray(a)
    return jax.device_put(np.asarray(a), blocks_sharding(mesh))
