"""Row-sharded image ops with explicit ICI halo exchange.

The reference has no distributed layer at all (SURVEY.md §2d) -- its only
parallelism is per-block data parallelism on one accelerator. Scaling
butteraugli to large images across chips needs exactly one communication
pattern: every stage is local except the Gaussian blurs / small poolings,
whose kernel radius (max 32 px at sigma=14) demands neighbor rows. This
module implements that as `shard_map` + `lax.ppermute` halo exchange over a
mesh axis that shards image rows.

Exactness: `ppermute` yields zeros where no shard permutes in, which is
precisely the reference blur's "out-of-image taps contribute zero"
semantics (butteraugli.cc:68-98); multiplying by the *globally* computed
per-row border weights then reproduces _Blur bit-for-bit for stride-1
sigmas. (The sigma>=3 step-subsampled blurs go through XLA's automatic SPMD
partitioning instead, which inserts its own halo collectives.)
"""


import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

from guetzli_tpu.ops.blur import _border_weights, gauss_taps


def halo_exchange_rows(local, halo, axis_name):
    """Gather `halo` rows from the up/down neighbors along `axis_name`.

    local: [h_loc, ...]; returns [h_loc + 2*halo, ...] with zero rows where
    the image ends (first shard's top, last shard's bottom).
    """
    n = lax.axis_size(axis_name)
    fwd = [(j, j + 1) for j in range(n - 1)]      # j sends to j+1
    bwd = [(j, j - 1) for j in range(1, n)]       # j sends to j-1
    from_above = lax.ppermute(local[-halo:], axis_name, fwd)
    from_below = lax.ppermute(local[:halo], axis_name, bwd)
    return jnp.concatenate([from_above, local, from_below], axis=0)


def _conv_rows_valid(x, taps):
    """[H, W] x [K] -> [H - K + 1, W] correlation along rows."""
    lhs = x.T[:, None, :]                          # [W, 1, H]
    rhs = taps[None, None, :]
    out = lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding=[(0, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=lax.Precision.HIGHEST)
    return out[:, 0, :].T


def _conv_cols_same(x, taps, offset):
    lhs = x[:, None, :]                            # [H, 1, W]
    rhs = taps[None, None, :]
    out = lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,),
        padding=[(offset, taps.shape[0] - 1 - offset)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=lax.Precision.HIGHEST)
    return out[:, 0, :]


def sharded_blur(channel, sigma, border_ratio, mesh, axis_name="tile"):
    """Reference-exact stride-1 blur of a [H, W] image whose rows are
    sharded over `axis_name`. H must divide evenly by the axis size."""
    h, w = channel.shape
    taps, offset = gauss_taps(sigma)
    assert max(1, int(sigma / 3.0)) == 1, "use XLA SPMD for subsampled blurs"
    taps_key = tuple(taps.tolist())
    scale_x = jnp.asarray(_border_weights(w, taps_key, offset, 1,
                                          border_ratio))
    scale_y = jnp.asarray(_border_weights(h, taps_key, offset, 1,
                                          border_ratio))
    jt = jnp.asarray(taps)

    def kernel(x, sy):
        # x: [h_loc, W] local rows; sy: [h_loc] global border weights.
        t = _conv_cols_same(x, jt, offset) * scale_x[None, :]
        ext = halo_exchange_rows(t, offset, axis_name)
        return _conv_rows_valid(ext, jt) * sy[:, None]

    f = jax.shard_map(
        kernel, mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name)),
        out_specs=P(axis_name, None))
    return f(channel, scale_y)


def pmax_scalar(value, axis_name):
    """Global reduction for ButteraugliScoreFromDiffmap across shards."""
    return lax.pmax(value, axis_name)
