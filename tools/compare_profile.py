#!/usr/bin/env python
"""Per-stage timing of the full-compare program on the live backend.

The fused compare (one XLA program) is the hot op of the quant search and
the back-end loop; this times each pipeline stage as its own jit at the
same padded geometry, so a TPU window tells us where the milliseconds go
(stage walls do not sum exactly to the fused wall -- XLA fuses across
stage boundaries -- but the ranking is what drives optimization).

Usage: python tools/compare_profile.py [WxH] [--reps N]
Prints one JSON line with per-stage {ms, gflops_s}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    geom = argv[0] if argv else "1332x774"
    reps = int(sys.argv[sys.argv.index("--reps") + 1]) \
        if "--reps" in sys.argv else 10
    w, h = map(int, geom.split("x"))

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from guetzli_tpu import comparator as cmp_mod
    from guetzli_tpu import consts
    from guetzli_tpu.codec.encoder import encode_rgb_to_jpeg
    from guetzli_tpu.comparator import Comparator
    from guetzli_tpu.ops import diffmap as dm
    from guetzli_tpu.search import state as st
    from guetzli_tpu.search.processor import Params

    im = Image.open("/root/reference/tests/bees.png").convert("RGB")
    if (w, h) != im.size:
        im = im.resize((w, h))
    rgb = np.asarray(im, np.uint8)

    params = Params()
    params.butteraugli_target = consts.butteraugli_score_for_quality(95)
    comp = Comparator(rgb, w, h, params.butteraugli_target)
    jpg = encode_rgb_to_jpeg(rgb, w, h)
    st.remove_original_quantization(jpg)
    img = st.CoeffImage.from_jpeg(jpg)
    g = comp.geom
    assert g is not None, "padded-bucket geometry expected"

    out = {"geom": geom, "backend": jax.default_backend(),
           "bucket": [g.wp, g.hp]}

    def timed(fn, *args):
        r = fn(*args)
        jax.block_until_ready(r)
        t0 = time.time()
        for _ in range(reps):
            r = fn(*args)
        jax.block_until_ready(r)
        return (time.time() - t0) / reps

    def record(name, fn, *args, **statics):
        jfn = jax.jit(fn, static_argnames=tuple(statics)) if statics \
            else jax.jit(fn)
        call = lambda: jfn(*args, **statics)   # noqa: E731
        try:
            secs = timed(lambda *_: call())
            flops = jfn.lower(*args, **statics).compile() \
                .cost_analysis().get("flops", 0.0)
            out[name] = {"ms": round(secs * 1e3, 3),
                         "gflops_s": round(flops / secs / 1e9, 1)}
        except Exception as e:
            out[name] = {"error": str(e)[:200]}

    # Stage inputs at the padded geometry.
    wv = jnp.int32(w)
    hv = jnp.int32(h)
    sc = comp._sc
    xyb0 = comp.xyb0
    # A realistic xyb1: the candidate side of the first compare.
    cp = g.pad_blocks(img.coeffs, img.bw, img.bh, g.bwp, g.bhp)
    args = (jnp.asarray(cp), xyb0,
            jnp.float32(params.butteraugli_target), wv, hv, sc)
    statics = dict(bwp=g.bwp, bhp=g.bhp, wp=g.wp, hp=g.hp,
                   sizex=8, sizey=8, gbwp=g.bwp, gbhp=g.bhp,
                   direction_pos=True)

    # Fused production program first (the number everything compares to).
    fn = cmp_mod._compare_weights_444_dyn
    full = lambda: fn(*args, **statics)[0]      # noqa: E731
    secs = timed(lambda *_: full())
    flops = fn.lower(*args, **statics).compile() \
        .cost_analysis().get("flops", 0.0)
    out["fused_compare"] = {"ms": round(secs * 1e3, 3),
                            "gflops_s": round(flops / secs / 1e9, 1)}

    from guetzli_tpu.ops import image as img_ops
    from guetzli_tpu.ops.opsin import opsin_dynamics_image_dyn

    record("coeffs_to_linear", img_ops.coeffs_to_linear_rgb, args[0],
           bw=g.bwp, bh=g.bhp, w=g.wp, h=g.hp)
    lin = jax.jit(img_ops.coeffs_to_linear_rgb,
                  static_argnames=("bw", "bh", "w", "h"))(
        args[0], bw=g.bwp, bh=g.bhp, w=g.wp, h=g.hp)
    record("opsin", opsin_dynamics_image_dyn, lin, wv, hv, sc)

    xyb1 = xyb0 * jnp.float32(0.995)    # same-shape stand-in candidate
    record("mhic", dm.mask_high_intensity_change_dyn, xyb0, xyb1, wv, hv)
    m0, m1 = jax.jit(dm.mask_high_intensity_change_dyn)(xyb0, xyb1, wv, hv)
    record("edge_detector", dm.edge_detector_map_dyn, m0, m1, wv, hv, sc)
    record("block_diff", dm.block_diff_map_dyn, m0, m1, wv, hv)
    ac = jax.jit(dm.block_diff_map_dyn)(m0, m1, wv, hv)[1]
    record("edge_low_freq", dm.edge_detector_low_freq_dyn, m0, m1, ac,
           wv, hv, sc)
    record("mask", dm.mask_dyn, m0, m1, wv, hv, sc)
    record("diffmap_full", dm.diffmap_opsin_dynamics_dyn, xyb0, xyb1,
           wv, hv, sc)
    record("weights",
           lambda d, t, **st_: cmp_mod._weights_all_radii_impl(d, t, **st_),
           jnp.zeros((g.hp, g.wp), jnp.float32),
           jnp.float32(params.butteraugli_target),
           sizex=8, sizey=8, bw=g.bwp, bh=g.bhp, direction_pos=True)

    # The blur ladder inside mask/edge stages, individually.
    from guetzli_tpu.ops import blur as blur_ops
    plane = xyb0
    for sigma in (1.1, 2.25, consts.OPSIN_SIGMA, 8.85, 14.26):
        sx = jnp.asarray(blur_ops.border_scales(w, g.wp, float(sigma)))
        sy = jnp.asarray(blur_ops.border_scales(h, g.hp, float(sigma)))
        record("blur_%.2f" % sigma,
               lambda p, sx_, sy_, sigma=0.0:
               blur_ops.blur_dyn(p, sigma, sx_, sy_),
               plane, sx, sy, sigma=float(sigma))

    # Tile path (the zeroing loop's per-candidate evaluation): fused
    # block-eval plus its stages, at this image's lookahead-3 batch size.
    from guetzli_tpu.ops import tiles as tile_ops
    from guetzli_tpu.ops import blockdiff as bd
    from guetzli_tpu.ops.opsin import opsin_dynamics_blocks

    comp.compare(np.stack([c.coeffs for c in img.comps], 0),
                 img.bw, img.bh)
    comp.start_block_comparisons()
    xyb0_tiles, scales, ysel, xsel = comp.block_state(1, 1)
    rep3 = lambda a: jnp.repeat(a, 3, axis=0)       # noqa: E731
    cand = jnp.asarray(
        np.repeat(np.asarray(cp).transpose(1, 0, 2), 3, 0))
    targs = (cand, rep3(xyb0_tiles), rep3(scales), rep3(ysel), rep3(xsel))
    out["tiles"] = int(cand.shape[0])

    bfn = cmp_mod._compare_block_batch
    secs = timed(lambda: bfn(*targs))
    bflops = bfn.lower(*targs).compile().cost_analysis().get("flops", 0.0)
    out["block_eval"] = {"ms": round(secs * 1e3, 3),
                         "gflops_s": round(bflops / secs / 1e9, 1)}

    # Lane-major evaluation of the same batch (the production zeroing
    # mode '444l'): the A/B that justifies (or kills) the layout.
    from guetzli_tpu.ops import tiles_lanes as tl
    aux_t = tl.transpose_aux_444(targs[1], targs[2], targs[3], targs[4])
    lfn = jax.jit(tl.compare_blocks_lanes444)
    secs = timed(lambda: lfn(targs[0], *aux_t))
    lflops = lfn.lower(targs[0], *aux_t).compile() \
        .cost_analysis().get("flops", 0.0)
    out["block_eval_lanes"] = {"ms": round(secs * 1e3, 3),
                               "gflops_s": round(lflops / secs / 1e9, 1)}

    record("t_to_linear", tile_ops.tiles_to_linear_rgb,
           targs[0], targs[4], targs[3])
    lin_t = jax.jit(tile_ops.tiles_to_linear_rgb)(targs[0], targs[4],
                                                  targs[3])
    record("t_opsin", opsin_dynamics_blocks, lin_t)
    x1t = jax.jit(opsin_dynamics_blocks)(lin_t)
    x0t = targs[1].reshape(targs[1].shape[:-1] + (8, 8))
    record("t_mhic", tile_ops.mask_high_intensity_change_tiles, x0t, x1t)
    m0t, m1t = jax.jit(tile_ops.mask_high_intensity_change_tiles)(x0t, x1t)
    f0 = m0t.reshape(m0t.shape[:-2] + (64,))
    f1 = m1t.reshape(m1t.shape[:-2] + (64,))
    record("t_blockdiff", bd.block_diff, f0, f1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
