#!/usr/bin/env python
"""Bisect the Mosaic AOT failure in the fused Pallas tile-compare.

Compiles a ladder of progressively larger sub-kernels (idct -> +edge
replication -> +color/linear -> +opsin -> +mhic -> +blockdiff -> full)
each in a fresh subprocess (the AOT helper SIGABRT can poison the
process), reporting the first stage that fails. One TPU window is enough
to localize the faulting op instead of re-observing one opaque SIGABRT.

Usage: python tools/pallas_bisect.py [--dot] [--stage NAME]
Writes a JSON summary to stdout; per-stage logs to /tmp/pallas_bisect_*.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STAGES = ("lanes_full", "idct", "edgerep", "color", "opsin", "mhic",
          "blockdiff", "full")

LANES_CODE = r"""
import sys
sys.path.insert(0, %(repo)r)
import os
INTERPRET = os.environ.get("_GT_BISECT_INTERPRET") == "1"
import numpy as np
import jax
import jax.numpy as jnp
from guetzli_tpu.kernels.tile_compare_lanes import (TILE_N,
                                                    tile_compare_pallas_lanes)

n = TILE_N
out = tile_compare_pallas_lanes(
    jnp.zeros((n, 3, 64), jnp.int32),
    jnp.zeros((n, 3, 64), jnp.float32),
    jnp.zeros((n, 3), jnp.float32),
    jnp.zeros((n, 8), jnp.int32),
    jnp.zeros((n, 8), jnp.int32),
    interpret=INTERPRET)
jax.block_until_ready(out)
print("STAGE_OK", "lanes_full")
"""

STAGE_CODE = r"""
import sys
sys.path.insert(0, %(repo)r)
import os
# (GUETZLI_TPU_PALLAS_DOT was deleted in r05; the dot forms are pinned
# off in kernels/tile_compare.py and this knob is a no-op.)
INTERPRET = os.environ.get("_GT_BISECT_INTERPRET") == "1"
if INTERPRET:
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path[:] = [p for p in sys.path if "axon" not in p]
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from guetzli_tpu.kernels import tile_compare as tc

STAGE = %(stage)r
TILE = tc.TILE


def kernel(cand_ref, xyb0_ref, scale_ref, sy_ref, sx_ref, csfd_ref,
           mats_ref, out_ref):
    mats = mats_ref[...]
    vals = tc._idct_int(cand_ref[...])
    if STAGE == "idct":
        out_ref[...] = jnp.mean(jnp.mean(jnp.mean(
            vals.astype(jnp.float32), axis=-1), axis=-1), axis=-1,
            keepdims=True)
        return
    sy = sy_ref[...]
    sx = sx_ref[...]
    chans = []
    for c in range(3):
        vc = vals[:, c]
        rows = [None] * 8
        for i in range(8):
            acc = sy[:, i, 0:1] * vc[:, 0, :]
            for j in range(1, 8):
                acc = acc + sy[:, i, j:j + 1] * vc[:, j, :]
            rows[i] = acc
        v2 = jnp.stack(rows, axis=1)
        cols = [None] * 8
        for i in range(8):
            acc = sx[:, i, 0:1] * v2[:, :, 0]
            for j in range(1, 8):
                acc = acc + sx[:, i, j:j + 1] * v2[:, :, j]
            cols[i] = acc
        chans.append(jnp.stack(cols, axis=2))
    v = jnp.stack(chans, axis=1)
    if STAGE == "edgerep":
        out_ref[...] = jnp.mean(jnp.mean(jnp.mean(
            v.astype(jnp.float32), axis=-1), axis=-1), axis=-1,
            keepdims=True)
        return
    yy = v[:, 0]
    cb = v[:, 1] - 128
    cr = v[:, 2] - 128
    r = yy + ((91881 * cr + 32768) >> 16)
    b = yy + ((116130 * cb + 32768) >> 16)
    g = yy + (((-46802) * cr + (-22554) * cb + 32768) >> 16)
    rgb = jnp.clip(jnp.stack([r, g, b], axis=1), 0, 255)
    lin = tc._srgb_to_linear(rgb)
    if STAGE == "color":
        out_ref[...] = jnp.mean(jnp.mean(jnp.mean(lin, axis=-1), axis=-1),
                                axis=-1, keepdims=True)
        return
    xyb1 = tc._opsin8x8(lin, mats)
    if STAGE == "opsin":
        out_ref[...] = jnp.mean(jnp.mean(jnp.mean(xyb1, axis=-1), axis=-1),
                                axis=-1, keepdims=True)
        return
    m0, m1 = tc._mhic(xyb0_ref[...], xyb1)
    if STAGE == "mhic":
        out_ref[...] = jnp.mean(jnp.mean(jnp.mean(
            m0 + m1, axis=-1), axis=-1), axis=-1, keepdims=True)
        return
    dc, ac, edge = tc._block_diff(m0, m1, csfd_ref[...], mats)
    if STAGE == "blockdiff":
        out_ref[...] = dc[0] + ac[1] + edge[2]
        return
    scale = scale_ref[...]
    diff = jnp.zeros_like(dc[0])
    diff_edge = jnp.zeros_like(dc[0])
    for c in range(3):
        sc = scale[:, c:c + 1]
        diff = diff + (dc[c] + ac[c]) * sc
        diff_edge = diff_edge + edge[c] * sc
    w = jnp.float32(tc.consts.BLOCK_EDGE_WEIGHT)
    out_ref[...] = jnp.sqrt((1.0 - w) * diff + w * diff_edge)


n = TILE
f = pl.pallas_call(
    kernel,
    grid=(n // TILE,),
    in_specs=[
        pl.BlockSpec((TILE, 3, 8, 8), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE, 3, 8, 8), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE, 8, 8), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE, 8, 8), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 8, 8), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
    interpret=INTERPRET,
)

args = (
    jnp.zeros((n, 3, 8, 8), jnp.int32),
    jnp.zeros((n, 3, 8, 8), jnp.float32),
    jnp.zeros((n, 3), jnp.float32),
    jnp.zeros((n, 8, 8), jnp.int32),
    jnp.zeros((n, 8, 8), jnp.int32),
    jnp.asarray((tc._CSF64 * tc._CSF_MASK).reshape(8, 8)),
    jnp.asarray(np.stack([tc._BM.T, tc._DFT_RE.T, tc._DFT_IM.T])),
)
lowered = jax.jit(f).lower(*args)
compiled = lowered.compile()
out = compiled(*args)
jax.block_until_ready(out)
print("STAGE_OK", STAGE)
"""


def run_stage(stage, dot, timeout=1500):
    if stage == "lanes_full":
        code = LANES_CODE % {"repo": REPO}
    else:
        code = STAGE_CODE % {"repo": REPO, "stage": stage,
                             "dot": "1" if dot else "0"}
    log = "/tmp/pallas_bisect_%s_dot%d.log" % (stage, int(dot))
    env = dict(os.environ)
    if env.get("_GT_BISECT_INTERPRET") == "1":
        # CPU smoke mode: the accelerator sitecustomize imports jax at
        # interpreter start, so the platform pin must happen out here.
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = os.pathsep.join(
            p for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and "axon" not in p)
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout,
                           capture_output=True, text=True, cwd=REPO,
                           env=env)
        ok = "STAGE_OK" in r.stdout
        tail = (r.stdout + r.stderr)[-1200:]
    except subprocess.TimeoutExpired:
        ok, tail = False, "TIMEOUT %ss" % timeout
    with open(log, "w") as f:
        f.write(tail)
    return ok, tail


def main():
    dot = "--dot" in sys.argv
    stages = STAGES
    if "--stage" in sys.argv:
        stages = (sys.argv[sys.argv.index("--stage") + 1],)
    results = {}
    first_fail = None
    for st in stages:
        ok, tail = run_stage(st, dot)
        results[st] = {"ok": ok}
        if not ok:
            # keep only the mosaic check-fail line if present
            lines = [ln for ln in tail.splitlines()
                     if "Check failed" in ln or "SIGABRT" in ln
                     or "INTERNAL" in ln]
            results[st]["err"] = (lines or [tail[-300:]])[:3]
            first_fail = first_fail or st
            print(json.dumps({"stage": st, "ok": False,
                              "err": results[st]["err"]}))
        else:
            print(json.dumps({"stage": st, "ok": True}))
    print(json.dumps({"first_fail": first_fail, "dot": dot,
                      "results": {k: v["ok"] for k, v in results.items()}}))


if __name__ == "__main__":
    main()
