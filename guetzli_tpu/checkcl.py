"""Runtime kernel verification -- the CHECKCL/CHECKCUDA analog.

The reference's --checkcl mode runs every OpenCL kernel next to the CPU
implementation on the same inputs and reports per-stage mismatch counts at
tol=0.001 (clguetzli_test.cpp:21-36, one tcl* comparator per stage at
:38-449). Here the "CPU implementation" is ops/numpy_ref.py -- a float64
NumPy build of every butteraugli stage validated against reference dumps --
and each XLA stage is diffed against it on the *user's actual image*:

  opsin, each blur sigma, MaskHighIntensityChange, EdgeDetectorMap,
  BlockDiffMap (dc+ac), EdgeDetectorLowFreq, DiffPrecompute, Average5x5,
  MinSquareVal, Mask(+dc), CombineChannels, CalculateDiffmap, score, and
  the per-block zeroing-order error core (CompareBlock).

Two alternative device paths keep their dual-execution checks as well: the
fused Pallas tile-compare kernel and the ppermute halo-exchange sharded
blur.
"""

import sys

import numpy as np

_TOL = 1e-3  # clguetzli_test.cpp:27 floatCompare tolerance


def _report(stage, got, want, tol=_TOL):
    got = np.asarray(got, dtype=np.float64).ravel()
    want = np.asarray(want, dtype=np.float64).ravel()
    err = np.abs(got - want) / np.maximum(np.abs(want), 1.0)
    bad = int((err > tol).sum())
    sys.stderr.write(
        f"checkcl {stage}: {bad}/{got.size} mismatches over tol {tol:g} "
        f"(max rel err {float(err.max() if err.size else 0):.2e})\n")
    return bad


def _stage_checks(rgb, w, h):
    """Diff every XLA butteraugli stage against the float64 NumPy oracle
    on this image. Returns total mismatch count."""
    import jax.numpy as jnp

    from guetzli_tpu import consts
    from guetzli_tpu.ops import blockdiff as bd_ops
    from guetzli_tpu.ops import diffmap as dm_ops
    from guetzli_tpu.ops import numpy_ref as nr
    from guetzli_tpu.ops import opsin as opsin_ops
    from guetzli_tpu.ops.blur import blur as xla_blur

    total = 0
    lut = consts.SRGB_TO_LINEAR.astype(np.float64)
    rgb = np.asarray(rgb, dtype=np.uint8).reshape(h, w, 3)
    lin0 = lut[rgb].transpose(2, 0, 1)                       # [3, H, W]
    # Candidate: the coarsely-quantized (quant=3) reconstruction, decoded
    # through the production path -- a realistic "distorted" second image.
    from guetzli_tpu.codec.encoder import encode_rgb_to_jpeg
    from guetzli_tpu.search.processor import decode_jpeg_to_rgb
    jpg = encode_rgb_to_jpeg(rgb, w, h,
                             quant=np.full((3, 64), 3, dtype=np.int32))
    rgb1 = decode_jpeg_to_rgb(jpg)
    lin1 = lut[rgb1].transpose(2, 0, 1)

    f32 = lambda a: jnp.asarray(np.asarray(a, dtype=np.float32))

    # Stage: blur, each sigma the pipeline uses (tclBlur analog).
    sigmas = sorted({consts.OPSIN_SIGMA, consts.EDGE_LF_SIGMA,
                     consts.DIFFMAP_SIGMA}
                    | set(consts.EDGE_DETECTOR_SIGMAS)
                    | set(consts.MASK_SIGMAS))
    for s in sigmas:
        want = nr.blur(lin0[1], s, 0.0)
        got = xla_blur(f32(lin0[1]), s, 0.0)
        total += _report(f"Blur sigma={s:g}", got, want)

    # Stage: opsin dynamics (tclOpsinDynamicsImage).
    xyb0 = nr.opsin_dynamics_image(lin0)
    xyb1 = nr.opsin_dynamics_image(lin1)
    # The sensitivity division gamma(pre)/pre amplifies f32-vs-f64 blur
    # noise; the reference diffs two *float32* builds (clguetzli_test.cpp:27)
    # so its 1e-3 never sees this. 5e-3 still catches real kernel bugs.
    total += _report("OpsinDynamicsImage",
                     opsin_ops.opsin_dynamics_image(f32(lin0)), xyb0,
                     tol=5e-3)

    # Stage: MaskHighIntensityChange.
    m0, m1 = nr.mask_high_intensity_change(xyb0, xyb1)
    g0, g1 = dm_ops.mask_high_intensity_change(f32(xyb0), f32(xyb1))
    total += _report("MaskHighIntensityChange",
                     np.stack([np.asarray(g0), np.asarray(g1)]),
                     np.stack([m0, m1]))

    # Stage: EdgeDetectorMap.
    want_edge = nr.edge_detector_map(m0, m1)
    got_edge = dm_ops.edge_detector_map(f32(m0), f32(m1))
    total += _report("EdgeDetectorMap", got_edge, want_edge)

    # Stage: BlockDiffMap (dc + ac).
    want_dc, want_ac = nr.block_diff_map(m0, m1)
    got_dc, got_ac = dm_ops.block_diff_map(f32(m0), f32(m1))
    total += _report("BlockDiffMap(dc)", got_dc, want_dc)
    total += _report("BlockDiffMap(ac)", got_ac, want_ac)

    # Stage: EdgeDetectorLowFreq (added into the ac map).
    want_ac2 = nr.edge_detector_low_freq(m0, m1, want_ac)
    got_ac2 = dm_ops.edge_detector_low_freq(f32(m0), f32(m1),
                                            f32(want_ac))
    total += _report("EdgeDetectorLowFreq", got_ac2, want_ac2)

    # Stage: DiffPrecompute -> Average5x5 -> MinSquareVal -> Mask.
    want_pre = nr.diff_precompute(m0, m1)
    total += _report("DiffPrecompute",
                     dm_ops.diff_precompute(f32(m0), f32(m1)), want_pre)
    want_avg = np.stack([nr.average5x5(p) for p in want_pre])
    total += _report("Average5x5", dm_ops.average5x5(f32(want_pre)),
                     want_avg)
    want_min = np.stack([nr.min_square_val(p) for p in want_avg])
    total += _report("MinSquareVal", dm_ops.min_square_val(f32(want_avg)),
                     want_min)
    want_mask, want_mask_dc = nr.mask(m0, m1)
    got_mask, got_mask_dc = dm_ops.mask(f32(m0), f32(m1))
    total += _report("Mask", got_mask, want_mask)
    total += _report("Mask(dc)", got_mask_dc, want_mask_dc)

    # Stage: CombineChannels + CalculateDiffmap + score.
    want_res = nr.combine_channels(want_mask, want_mask_dc, want_dc,
                                   want_ac2, want_edge, h, w)
    got_res = dm_ops.combine_channels(
        f32(want_mask), f32(want_mask_dc), f32(want_dc), f32(want_ac2),
        f32(want_edge), h, w)
    total += _report("CombineChannels", got_res, want_res)
    want_dm = nr.calculate_diffmap(want_res, h, w)
    got_dm = dm_ops.calculate_diffmap(f32(want_res), h, w)
    total += _report("CalculateDiffmap", got_dm, want_dm)
    total += _report(
        "ButteraugliScore",
        np.asarray(dm_ops.score_from_diffmap(jnp.asarray(got_dm))),
        nr.score_from_diffmap(want_dm))

    # Stage: per-block zeroing-order error core (CompareBlock /
    # tclComputeBlockZeroingOrder analog) on a sample of blocks.
    from guetzli_tpu.ops import tiles as tile_ops
    bw, bh = -(-w // 8), -(-h // 8)
    nb = min(bw * bh, 128)
    xyb0_tiles = np.asarray(
        tile_ops.original_opsin_tiles(rgb, w, h, bw, bh))[:nb]
    coeffs = np.stack([c.coeffs.astype(np.int32) * 3
                       for c in jpg.components])
    cand = np.transpose(coeffs, (1, 0, 2))[:nb]             # [nb, 3, 64]
    ysel, xsel = tile_ops.edge_gather_indices(bw, bh, w, h)
    cand_lin = np.asarray(tile_ops.tiles_to_linear_rgb(
        jnp.asarray(cand), jnp.asarray(xsel[:nb]), jnp.asarray(ysel[:nb])))
    scales = np.ascontiguousarray(
        np.stack([np.asarray(want_mask)[c, (np.arange(nb) // bw) * 8,
                                        (np.arange(nb) % bw) * 8]
                  for c in range(3)], axis=-1))
    want_cb = nr.compare_blocks(
        xyb0_tiles.reshape(nb, 3, 8, 8).astype(np.float64),
        cand_lin.astype(np.float64), scales)
    got_cb = tile_ops.compare_blocks(f32(xyb0_tiles), f32(cand_lin),
                                     f32(scales))
    total += _report(f"CompareBlock[{nb} blocks]", got_cb, want_cb)

    # Stage: the lane-major (tiles-last) evaluation of the same blocks
    # (ops/tiles_lanes.py, the zeroing loop's default device program).
    from guetzli_tpu.ops import tiles_lanes as tl
    aux_t = tl.transpose_aux_444(f32(xyb0_tiles), f32(scales),
                                 jnp.asarray(ysel[:nb]),
                                 jnp.asarray(xsel[:nb]))
    got_lanes = tl.compare_blocks_lanes444(jnp.asarray(cand), *aux_t)
    total += _report(f"CompareBlockLanes[{nb} blocks]", got_lanes, want_cb)
    return total


def run_checkcl(rgb, w, h) -> int:
    """Verify every stage and alternative kernel on this image.

    Returns the total mismatch count (0 = all stages agree)."""
    import jax
    import jax.numpy as jnp

    from guetzli_tpu.codec.encoder import encode_rgb_to_jpeg
    from guetzli_tpu.comparator import Comparator
    from guetzli_tpu.kernels import tile_compare as tc
    from guetzli_tpu.ops import blur as blur_ops
    from guetzli_tpu.ops import tiles as tile_ops
    from guetzli_tpu.parallel import halo

    total = _stage_checks(rgb, w, h)

    # Alternative path 1: fused Pallas tile-compare vs the XLA tile pipeline
    # (the analog of tclComputeBlockZeroingOrder, clguetzli_test.cpp).
    jpg = encode_rgb_to_jpeg(
        rgb, w, h, quant=np.full((3, 64), 3, dtype=np.int32))
    coeffs = np.stack([c.coeffs.astype(np.int32) * 3
                       for c in jpg.components])
    comp = Comparator(rgb, w, h, 1.0)
    comp.start_block_comparisons()
    xyb0_tiles, scales, ysel, xsel = comp.block_state(1, 1)
    cand = jnp.asarray(np.transpose(coeffs, (1, 0, 2)))      # [NB, 3, 64]
    nb = cand.shape[0]

    want = tile_ops.compare_blocks(
        xyb0_tiles, tile_ops.tiles_to_linear_rgb(cand, xsel, ysel), scales)

    def pad(a, n):
        a = np.asarray(a)
        return np.concatenate(
            [a, np.zeros((n - a.shape[0],) + a.shape[1:], a.dtype)])

    n = ((nb + tc.TILE - 1) // tc.TILE) * tc.TILE
    sy, sx = tc._selection_matrices(ysel, xsel)
    try:
        got = tc.tile_compare_pallas(
            jnp.asarray(pad(cand, n)), jnp.asarray(pad(xyb0_tiles, n)),
            jnp.asarray(pad(scales, n)), jnp.asarray(pad(sy, n)),
            jnp.asarray(pad(sx, n)))[:nb]
        total += _report("tile_compare(pallas)", got, want)
    except Exception as e:  # Mosaic lowering unsupported on this backend
        sys.stderr.write(f"checkcl tile_compare(pallas): SKIPPED ({e})\n")

    # Alternative path 1b: the lane-major fused Pallas kernel (the
    # formulation the Mosaic AOT toolchain compiles on TPU; on CPU it
    # falls back to interpret mode inside tile_compare_pallas_lanes).
    from guetzli_tpu.kernels import tile_compare_lanes as tcl
    nl = ((nb + tcl.TILE_N - 1) // tcl.TILE_N) * tcl.TILE_N
    try:
        got = tcl.tile_compare_pallas_lanes(
            jnp.asarray(pad(cand, nl)), jnp.asarray(pad(xyb0_tiles, nl)),
            jnp.asarray(pad(scales, nl)), jnp.asarray(pad(ysel, nl)),
            jnp.asarray(pad(xsel, nl)))[:nb]
        # The lane-major kernel's validated agreement band vs the
        # blocks-leading XLA reference is 5e-3 (tests/test_pallas_kernel:
        # different reduction orders); the default 1e-3 would flag
        # spurious mismatches in a diagnostic meant for real bugs.
        total += _report("tile_compare(pallas_lanes)", got, want,
                         tol=5e-3)
    except Exception as e:
        sys.stderr.write(
            f"checkcl tile_compare(pallas_lanes): SKIPPED ({e})\n")

    # Alternative path 2: ppermute halo-exchange sharded blur vs
    # single-device blur (exercises the multi-chip collective path).
    ndev = len(jax.devices())
    if ndev > 1:
        try:
            mesh = jax.sharding.Mesh(np.asarray(jax.devices()), ("rows",))
            xyb0 = np.asarray(comp.xyb0[0])            # [H, W] X channel
            hh = (xyb0.shape[0] // ndev) * ndev
            plane = jnp.asarray(xyb0[:hh])
            want_b = blur_ops.blur(plane, 1.1)
            got_b = halo.sharded_blur(plane, 1.1, 0.0, mesh, "rows")
            total += _report("blur(sharded)", got_b, want_b)
        except Exception as e:
            sys.stderr.write(f"checkcl blur(sharded): SKIPPED ({e})\n")
    else:
        sys.stderr.write("checkcl blur(sharded): SKIPPED (1 device)\n")
    return total
