"""Regression guard for the round-2 mpix1 OOM class.

The 8-wide quant wave at the 1 MPix bucket once materialized a
[8, 6, 276, 8, 468, 8] f32 tensor whose minor dim 8 the TPU T(8,128)
layout pads 16x -> 25.6 GB (bench_r02_live.log). TPU hardware is not
available in CI, so instead of compiling we lower the wave program to
StableHLO and bound the *tiled-layout* size of every tensor in it: any
plane-scale tensor with a narrow minor dim explodes under T(8,128) and
trips the per-tensor cap long before it would OOM a 16 GB chip.
"""

import os
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from guetzli_tpu.ops.padgeom import PadGeom

_TENSOR_RE = re.compile(r"tensor<([0-9]+(?:x[0-9]+)*)x(f32|f64|i32|i64|i8|"
                        r"ui8|i1|bf16|f16)[^>]*>")
_DTYPE_BYTES = {"f32": 4, "i32": 4, "f64": 8, "i64": 8, "i8": 1, "ui8": 1,
                "i1": 1, "bf16": 2, "f16": 2}


def _round_up(n, q):
    return -(-n // q) * q


def tiled_bytes(dims, dtype):
    """Worst-case TPU T(8,128) footprint of a tensor: minor dim padded to
    the 128-lane tile, second-minor to the 8-sublane tile."""
    if len(dims) == 0:
        return _DTYPE_BYTES[dtype]
    if len(dims) == 1:
        return _round_up(dims[0], 128) * 8 * _DTYPE_BYTES[dtype]
    lead = int(np.prod(dims[:-2], dtype=np.int64)) if len(dims) > 2 else 1
    return (lead * _round_up(dims[-2], 8) * _round_up(dims[-1], 128)
            * _DTYPE_BYTES[dtype])


def max_tiled_tensor(stablehlo_text):
    worst = (0, None)
    for m in _TENSOR_RE.finditer(stablehlo_text):
        dims = tuple(int(d) for d in m.group(1).split("x"))
        b = tiled_bytes(dims, m.group(2))
        if b > worst[0]:
            worst = (b, m.group(0))
    return worst


# The bad tensor was 25.6 GB; the legitimate lane-major window tensors at
# this geometry are <= ~1.8 GB under the 8-wide wave.
PER_TENSOR_CAP = 3 << 30


@pytest.mark.parametrize("kind", ["444", "420"])
def test_mpix1_quant_wave_tensors_fit_tiled_layout(kind, monkeypatch):
    # Force the accelerator formulation: this guard exists precisely for
    # the path CI's CPU backend would not otherwise trace.
    monkeypatch.setenv("GUETZLI_TPU_LANE_SAFE", "1")
    from guetzli_tpu import comparator as cmp_mod

    g = PadGeom(1332, 774)  # the bench's 1 MPix workload geometry
    b = 8
    f32 = jnp.float32
    sds = jax.ShapeDtypeStruct
    sc = {k: (sds(np.asarray(sx).shape, f32), sds(np.asarray(sy).shape, f32))
          for k, (sx, sy) in g.scales().items()}
    xyb0 = sds((3, g.hp, g.wp), f32)
    tgt = sds((), f32)
    w = sds((), jnp.int32)
    h = sds((), jnp.int32)
    if kind == "444":
        fn = jax.jit(cmp_mod._quant_batch_444_dyn.__wrapped__,
                     static_argnames=cmp_mod._DYN_STATICS_444)
        args = (sds((3, g.bwp * g.bhp, 64), jnp.int32),
                sds((b, 3, 64), jnp.int32), xyb0, tgt, w, h, sc)
        statics = dict(bwp=g.bwp, bhp=g.bhp, wp=g.wp, hp=g.hp, sizex=8,
                       sizey=8, gbwp=g.bwp, gbhp=g.bhp, direction_pos=True)
    else:
        cbwp, cbhp = g.wp // 16, g.hp // 16
        fn = jax.jit(cmp_mod._quant_batch_420_dyn.__wrapped__,
                     static_argnames=cmp_mod._DYN_STATICS_420)
        args = (sds((g.bwp * g.bhp, 64), jnp.int32),
                sds((cbwp * cbhp, 64), jnp.int32),
                sds((cbwp * cbhp, 64), jnp.int32),
                sds((b, 3, 64), jnp.int32), xyb0, tgt, w, h, sc)
        statics = dict(ybwp=g.bwp, ybhp=g.bhp, cbwp=cbwp, cbhp=cbhp,
                       wp=g.wp, hp=g.hp, sizex=8, sizey=8, gbwp=g.bwp,
                       gbhp=g.bhp, direction_pos=True)
    text = fn.lower(*args, **statics).as_text()
    worst_bytes, worst_type = max_tiled_tensor(text)
    assert worst_bytes <= PER_TENSOR_CAP, (
        "quant-wave program materializes a tensor that tiles to %.1f GB "
        "on TPU: %s" % (worst_bytes / 2**30, worst_type))


def test_tiled_bytes_flags_the_round2_oom_shape():
    # The exact shape from bench_r02_live.log must trip the guard.
    assert tiled_bytes((8, 6, 276, 8, 468, 8), "f32") > 20 << 30
