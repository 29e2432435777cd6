"""Runtime kernel verification -- the CHECKCL/CHECKCUDA analog.

The reference's --checkcl mode runs every OpenCL kernel next to the CPU
implementation on the same inputs and reports per-stage mismatch counts at
tol=0.001 (clguetzli_test.cpp:21-36). The TPU build has two alternative
implementations of hot stages -- the fused Pallas tile-compare kernel
(kernels/tile_compare.py) and the ppermute halo-exchange sharded blur
(parallel/halo.py) -- and this module verifies both against the canonical
XLA pipeline on the *user's actual image* at runtime, printing the same
kind of per-stage mismatch report.
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


def run_checkcl(rgb, w, h) -> int:
    """Verify alternative kernels against the XLA path on this image.

    Returns the total mismatch count (0 = all stages agree)."""
    import jax
    import jax.numpy as jnp

    from guetzli_tpu.codec.encoder import encode_rgb_to_jpeg
    from guetzli_tpu.comparator import Comparator
    from guetzli_tpu.kernels import tile_compare as tc
    from guetzli_tpu.ops import blur as blur_ops
    from guetzli_tpu.ops import tiles as tile_ops
    from guetzli_tpu.parallel import halo

    total = 0

    # Stage 1: fused Pallas tile-compare vs the XLA tile pipeline
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

    # Stage 2: ppermute halo-exchange sharded blur vs single-device blur
    # (the analog of tclBlur; exercises the multi-chip collective path).
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
