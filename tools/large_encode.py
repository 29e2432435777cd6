#!/usr/bin/env python
"""Large-image (multi-MPix) encode demo: the scaling + memory story.

The reference handles large inputs one whole image per process, memory
bounded by the 110 B/px guard (guetzli.cc:117-125); its accelerator path
keeps the full image resident on one GPU. The TPU-native equivalent:

  * every device program is bucket-shaped (ops/padgeom.py), so an 8 or
    16 MPix geometry costs one warm compile per bucket, not per size;
  * `--mesh N` shards the WHOLE encode (opsin, every blur, diffmap,
    zeroing while_loop, score all-reduce) over an N-device 1-D mesh via
    XLA GSPMD, byte-identical to single-device — HBM per chip scales as
    1/N, which is what makes 16 MPix fit comfortably (peak device
    footprint is ~40 [hp, wp] f32 planes ~ 2.5 GB at 16 MPix unsharded);
  * host memory stays within the same 110 B/px envelope as the
    reference (measured below via ru_maxrss).

Usage:
  python tools/large_encode.py [--mpix 8] [--mesh N] [--quality 95]
                               [--out /tmp/large.jpg] [--cpu]

Prints one JSON line with wall time, MPix/s, peak host RSS, and the
bytes/pixel ratio vs the 110 B/px guard.
"""

import json
import resource
import sys
import time

sys.path.insert(0, ".")


def synth_image(mpix: float, seed: int = 7):
    """Photograph-like synthetic image (smooth fields + texture + edges)
    at ~mpix megapixels, 3:2 aspect."""
    import numpy as np
    w = int((mpix * 1e6 * 3 / 2) ** 0.5 // 16 * 16)
    h = int(w * 2 / 3 // 16 * 16)
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = (128 + 80 * np.sin(xx / 97.0) * np.cos(yy / 61.0)
            + 40 * np.sin((xx + yy) / 211.0))
    tex = rng.normal(0, 6, (h, w)).astype(np.float32)
    edges = ((xx.astype(np.int32) // 160 + yy.astype(np.int32) // 160)
             % 2) * 24.0
    r = base + tex + edges
    g = 255 - base * 0.7 + tex
    b = (base * 1.3 + edges) % 256
    rgb = np.clip(np.stack([r, g, b], -1), 0, 255).astype(np.uint8)
    return rgb, w, h


def main():
    argv = sys.argv[1:]
    mpix = 8.0
    mesh = 0
    quality = 95.0
    out_path = None
    force_cpu = False
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--mpix":
            i += 1
            mpix = float(argv[i])
        elif a == "--mesh":
            i += 1
            mesh = int(argv[i])
        elif a == "--quality":
            i += 1
            quality = float(argv[i])
        elif a == "--out":
            i += 1
            out_path = argv[i]
        elif a == "--cpu":
            force_cpu = True
        else:
            sys.stderr.write(__doc__)
            return 1
        i += 1

    import os
    if force_cpu:
        from guetzli_tpu import runtime
        runtime.force_cpu()
    if mesh:
        os.environ["GUETZLI_TPU_MESH"] = str(mesh)
    from guetzli_tpu.runtime import configure
    configure()
    import jax

    from guetzli_tpu import consts
    from guetzli_tpu.ops.padgeom import bucket_dim
    from guetzli_tpu.search.processor import (Params, ProcessStats,
                                              process_rgb)

    rgb, w, h = synth_image(mpix)
    sys.stderr.write("image %dx%d (%.2f MPix), bucket %dx%d, "
                     "backend=%s, mesh=%d\n"
                     % (w, h, w * h / 1e6, bucket_dim(w), bucket_dim(h),
                        jax.devices()[0].platform, mesh))

    params = Params()
    params.butteraugli_target = consts.butteraugli_score_for_quality(
        quality)
    stats = ProcessStats()

    # RSS timeline sampler: phases run sequentially, so (t, rss) samples
    # align with the phase walls in stats.timings -- enough to attribute
    # the peak to a phase without tracemalloc overhead.
    samples = []
    stop = []

    def _rss_mb():
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) // 1024
        return 0

    import threading

    def _sampler(t_start):
        while not stop:
            samples.append((round(time.time() - t_start, 1), _rss_mb()))
            time.sleep(0.5)

    t0 = time.time()
    thr = threading.Thread(target=_sampler, args=(t0,), daemon=True)
    thr.start()
    out = process_rgb(params, rgb, w, h, stats)
    dt = time.time() - t0
    stop.append(True)
    thr.join(timeout=2)

    rss_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    npx = w * h
    result = {
        "mpix": round(npx / 1e6, 3),
        "wall_s": round(dt, 1),
        "mpix_per_s": round(npx / 1e6 / dt, 5),
        "out_bytes": len(out),
        "peak_rss_mb": rss_kb // 1024,
        "host_bytes_per_px": round(rss_kb * 1024 / npx, 1),
        "guard_bytes_per_px": 110,
        "backend": jax.devices()[0].platform,
        "mesh": mesh,
        "iters": stats.counters.get("iters", 0),
        "timings": {k: round(v, 1) for k, v in stats.timings.items()},
        # Decimated RSS timeline (t_s, rss_mb): at most ~120 points.
        "rss_timeline": samples[::max(1, len(samples) // 120)],
    }
    print(json.dumps(result))
    if out_path:
        with open(out_path, "wb") as f:
            f.write(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
