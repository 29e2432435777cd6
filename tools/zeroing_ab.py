#!/usr/bin/env python
"""A/B measurements for the zeroing-wave compare chain (the encoder's
dominant device program at production scale: t_blockdiff is 17.3 of the
20.9 ms block-eval at 1 MPix, tpu_r03_profile_1mpix.json).

Measures, for the lane-major CompareBlock (ops/tiles_lanes.py):
  - full-chain wall at two tile counts (bees-scale and 1 MPix-scale),
  - cumulative sub-chain walls (idct / +rgb / +linear / +opsin / +mhic /
    full) to attribute time within the chain,
  (The --dot/--quad MXU variants were deleted in round 5 after losing
  their hardware A/B -- see config.py and tpu_r05_dot_fused_1m.json.)

One configuration per process (the dot flag is read at trace time, so
an in-process flip would silently reuse stale executables):
  python tools/zeroing_ab.py [--dot] [--out FILE]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pallas", action="store_true",
                    help="also time the fused lane-major Pallas kernel "
                         "(compiled, not interpret) on the same inputs")
    ap.add_argument("--out", default="")
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from guetzli_tpu.runtime import configure
    configure()
    from guetzli_tpu import consts
    from guetzli_tpu.codec.encoder import encode_rgb_to_jpeg
    from guetzli_tpu.comparator import Comparator
    from guetzli_tpu.io.png import read_png
    from guetzli_tpu.ops import tiles_lanes as tl
    from guetzli_tpu.search import state as st

    with open("/root/reference/tests/bees.png", "rb") as f:
        rgb, w, h = read_png(f.read())
    target = consts.butteraugli_score_for_quality(95)
    comp = Comparator(rgb, w, h, target)
    jpg = encode_rgb_to_jpeg(rgb, w, h)
    st.remove_original_quantization(jpg)
    img = st.CoeffImage.from_jpeg(jpg)
    g = comp.geom
    cp = g.pad_blocks(img.coeffs, img.bw, img.bh, g.bwp, g.bhp)
    comp.compare(np.stack([c.coeffs for c in img.comps], 0),
                 img.bw, img.bh)
    comp.start_block_comparisons()
    xyb0_tiles, scales, ysel, xsel = comp.block_state(1, 1)
    nb = int(xyb0_tiles.shape[0])

    out = {"backend": jax.default_backend(), "nb": nb}

    def timed(fn, *a):
        """Chained timing (see tpu_r04_zeroing_ab.json correction):
        same-input repetition with block_until_ready under-measures on
        the proxy runtime, so each rep perturbs the first operand with
        the running accumulator and consumes the previous result; one
        host pull ends the loop."""
        import jax.numpy as jnp
        x0 = a[0]

        def step(acc):
            r = fn(x0 + (acc * 0).astype(x0.dtype), *a[1:])
            first = r[0] if isinstance(r, (tuple, list)) else r
            return jnp.sum(first) * 1e-30 + acc + 1.0
        float(step(jnp.float32(0.0)))                 # warm + sync
        t0 = time.time()
        acc = jnp.float32(0.0)
        for _ in range(args.reps):
            acc = step(acc)
        float(acc)
        return (time.time() - t0) / args.reps * 1e3   # ms

    def make_inputs(rep):
        """rep copies of every block's tile -> (cand [N,3,64], aux_t)."""
        cand = jnp.asarray(np.tile(
            np.asarray(cp).transpose(1, 0, 2), (rep, 1, 1)))
        r = lambda a: jnp.concatenate([jnp.asarray(a)] * rep)  # noqa:E731
        aux = (r(xyb0_tiles), r(scales), r(ysel), r(xsel))
        aux_t = tl.transpose_aux_444(*aux)
        return cand, aux_t

    # Sub-chain jits (lane-major layout throughout).
    def chain(upto):
        def f(cand, xyb0_t, scales_t, ymax, xmax):
            ct = jnp.transpose(cand.reshape(-1, 3, 8, 8), (1, 2, 3, 0))
            v = tl.idct_lanes(ct)
            if upto == "idct":
                return v
            v = tl.edge_replicate_lanes(v, ymax, xmax)
            rgbv = tl._ycbcr_to_rgb_lanes(v[0], v[1], v[2])
            if upto == "rgb":
                return rgbv
            lin = tl._srgb_to_linear_lanes(rgbv)
            if upto == "linear":
                return lin
            xyb1 = tl.opsin_blocks_lanes(lin)
            if upto == "opsin":
                return xyb1
            m0, m1 = tl.mhic_lanes(xyb0_t, xyb1)
            if upto == "mhic":
                return m0 + m1
            dc, ac, edge = tl.block_diff_lanes(m0, m1)
            diff = jnp.sum((dc + ac) * scales_t, axis=0)
            diff_edge = jnp.sum(edge * scales_t, axis=0)
            return jnp.sqrt((1.0 - tl._BLOCK_EDGE_W) * diff
                            + tl._BLOCK_EDGE_W * diff_edge)
        return jax.jit(f)

    full = jax.jit(tl.compare_blocks_lanes444)

    for rep, tag in ((3, "bees"), (27, "mpix1")):
        cand, aux_t = make_inputs(rep)
        n = int(cand.shape[0])
        row = {"tiles": n,
               "full_ms": round(timed(full, cand, *aux_t), 3)}
        for upto in ("idct", "rgb", "linear", "opsin", "mhic"):
            row["cum_%s_ms" % upto] = round(
                timed(chain(upto), cand, *aux_t), 3)
        try:
            fl = full.lower(cand, *aux_t).compile().cost_analysis()["flops"]
            row["gflops_s"] = round(fl / (row["full_ms"] / 1e3) / 1e9, 1)
        except Exception:
            pass
        out[tag] = row

    if args.pallas:
        from guetzli_tpu.kernels.tile_compare_lanes import (
            TILE_N, tile_compare_pallas_lanes)
        for rep, tag in ((3, "bees"), (27, "mpix1")):
            cand, _aux_t = make_inputs(rep)
            n = int(cand.shape[0])
            npad = (-n) % TILE_N
            if npad:
                cand = jnp.concatenate(
                    [cand, jnp.zeros((npad, 3, 64), cand.dtype)])
            r = lambda a, k=npad: jnp.concatenate(  # noqa: E731
                [jnp.asarray(a)] * rep
                + ([jnp.zeros((k,) + np.asarray(a).shape[1:],
                              np.asarray(a).dtype)] if k else []))
            aux = (r(xyb0_tiles), r(scales), r(ysel), r(xsel))
            fn = lambda: tile_compare_pallas_lanes(  # noqa: E731
                cand, *aux, interpret=False)
            try:
                ms = timed(lambda *_: fn())
                # Cross-check vs the XLA lane-major path on real rows.
                ek = np.asarray(fn())[:n]
                c2, aux_t2 = make_inputs(rep)
                ex = np.asarray(full(c2, *aux_t2))[:n]
                dev = float(np.abs(ek - ex).max())
                out["pallas_%s" % tag] = {
                    "tiles": n + npad, "ms": round(ms, 3),
                    "max_abs_dev_vs_xla": dev}
            except Exception as e:
                out["pallas_%s" % tag] = {"error": str(e)[-600:]}
                break

    # Host->device and device->host tunnel bandwidth: the 8 MPix capture
    # suggests uploads (~MB/s through the tunnel) dominate the untimed
    # back-end host work; this pins the number.
    bw_rows = {}
    for mb in (1, 8, 32):
        a = np.zeros(mb << 20, np.uint8)
        jax.block_until_ready(jnp.asarray(a))          # warm path
        t0 = time.time()
        d = jnp.asarray(a)
        jax.block_until_ready(d)
        up = time.time() - t0
        t0 = time.time()
        np.asarray(d)
        down = time.time() - t0
        bw_rows["h2d_%dmb_mb_s" % mb] = round(mb / up, 1)
        bw_rows["d2h_%dmb_mb_s" % mb] = round(mb / down, 1)
    out["bandwidth"] = bw_rows

    # Batch-size independence: the first nb tiles are identical content
    # at rep=3 and rep=27; their errors must match bitwise for the
    # lockstep==serial contract to survive this formulation.
    cand_a, aux_a = make_inputs(3)
    cand_b, aux_b = make_inputs(27)
    ea = np.asarray(full(cand_a, *aux_a))[:nb]
    eb = np.asarray(full(cand_b, *aux_b))[:nb]
    out["batch_independent_bitwise"] = bool(
        np.array_equal(ea.view(np.uint32), eb.view(np.uint32)))
    out["batch_dev_max"] = float(np.abs(ea - eb).max())

    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
