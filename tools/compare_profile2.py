#!/usr/bin/env python
"""Chained-timing stage profile of the whole-image compare (the program
backend_fetch waits on every iteration: ~1 s at 8 MPix, ~50 ms at
1 MPix).

Replaces tools/compare_profile.py, whose numbers were captured with the
invalid same-input/block_until_ready method (the r04 measurement
correction): every stage here is timed with dependency-chained reps and
one terminal host pull (bench.py `timed` methodology).

Usage: python tools/compare_profile2.py [WxH] [--reps N] [--out FILE]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("geom", nargs="?", default="1332x774")
    ap.add_argument("--reps", type=int, default=15)
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    w, h = map(int, args.geom.split("x"))

    from guetzli_tpu.runtime import configure
    configure()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from guetzli_tpu import comparator as cmod
    from guetzli_tpu import consts
    from guetzli_tpu.codec.encoder import encode_rgb_to_jpeg
    from guetzli_tpu.ops import diffmap as dm
    from guetzli_tpu.search import state as st

    im = Image.open("/root/reference/tests/bees.png").convert("RGB")
    if (w, h) != im.size:
        im = im.resize((w, h))
    rgb = np.asarray(im, np.uint8)

    comp = cmod.Comparator(rgb, w, h, 1.0)
    jpg = encode_rgb_to_jpeg(rgb, w, h)
    st.remove_original_quantization(jpg)
    img = st.CoeffImage.from_jpeg(jpg)
    g = comp.geom
    cp = jnp.asarray(g.pad_blocks(img.coeffs, img.bw, img.bh,
                                  g.bwp, g.bhp))
    statics = dict(bwp=g.bwp, bhp=g.bhp, wp=g.wp, hp=g.hp,
                   sizex=8, sizey=8, gbwp=g.bwp, gbhp=g.bhp,
                   direction_pos=True)
    tgt = jnp.float32(comp.target_distance)

    def timed(fn, x0):
        """Chained reps on a device-array operand; one terminal pull."""
        acc = fn(x0 + jnp.zeros((), x0.dtype))
        jax.block_until_ready(acc)
        float(acc)
        t0 = time.time()
        acc = jnp.float32(0.0)
        for _ in range(args.reps):
            acc = fn(x0 + (acc * 0).astype(x0.dtype))
        float(acc)
        return (time.time() - t0) / args.reps

    out = {"geom": args.geom, "backend": jax.default_backend(),
           "bucket": [int(g.wp), int(g.hp)], "reps": args.reps}

    # 1. The full production program (compare + dmap + weights grid).
    full = cmod._compare_weights_444_dyn

    def full_step(x):
        s, dmap, w4 = full(x, comp.xyb0, tgt, *comp._wh, comp._sc,
                           **statics)
        return s * 1e-30 + w4.sum() * 1e-30

    out["full_ms"] = round(1e3 * timed(full_step, cp), 2)

    # 2. Candidate reconstruction: coeffs -> padded opsin image
    # (the _cw444_dyn_core front half).
    from guetzli_tpu.ops import image as img_ops
    from guetzli_tpu.ops.opsin import opsin_dynamics_image_dyn
    wh = comp._wh
    sc = comp._sc
    recon = jax.jit(lambda c: opsin_dynamics_image_dyn(
        img_ops.coeffs_to_linear_rgb(c, g.bwp, g.bhp, g.wp, g.hp),
        *wh, sc))

    def recon_step(x):
        return recon(x).sum() * 1e-30
    out["recon_ms"] = round(1e3 * timed(recon_step, cp), 2)
    xyb1 = recon(cp)

    # 2b. The weights grid on a fixed diffmap.
    dmap0 = jax.jit(lambda x1: dm.diffmap_opsin_dynamics_dyn(
        comp.xyb0, x1, *wh, sc))(xyb1)

    def w4_step(x):
        w4 = cmod._weights_all_radii_impl(
            x, tgt, 8, 8, g.bwp, g.bhp, True)
        return w4.sum() * 1e-30
    out["weights_ms"] = round(
        1e3 * timed(jax.jit(w4_step), dmap0), 2)

    # 3. Diffmap on fixed opsin images, then its inner stages.

    def stage(fn):
        f = jax.jit(fn)

        def step(x):
            return f(x).sum() * 1e-30
        return round(1e3 * timed(step, xyb1), 2)

    out["diffmap_ms"] = stage(
        lambda x1: dm.diffmap_opsin_dynamics_dyn(comp.xyb0, x1, *wh, sc))
    out["mhic_ms"] = stage(
        lambda x1: sum(v.sum() for v in
                       dm.mask_high_intensity_change_dyn(
                           comp.xyb0, x1, *wh)))
    x0m, x1m = jax.jit(dm.mask_high_intensity_change_dyn)(
        comp.xyb0, xyb1, *wh)
    out["edge_map_ms"] = stage(
        lambda x1: dm.edge_detector_map_dyn(x0m, x1, *wh, sc).sum())
    out["block_diff_map_ms"] = stage(
        lambda x1: sum(v.sum() for v in
                       dm.block_diff_map_dyn(x0m, x1, *wh)))
    out["mask_ms"] = stage(
        lambda x1: sum(v.sum() for v in dm.mask_dyn(x0m, x1, *wh, sc)))

    js = json.dumps(out)
    print(js)
    if args.out:
        with open(args.out, "w") as f:
            f.write(js)


if __name__ == "__main__":
    main()
