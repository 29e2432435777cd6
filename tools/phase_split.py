#!/usr/bin/env python
"""Phase-split a single encode (wall + stats.timings breakdown).

Usage: python tools/phase_split.py [--cpu] [WxH] [quality]
Default geometry 1332x774 (the 1 MPix bench workload), quality 95.
--cpu re-execs with the accelerator plugin stripped so the run pins to
the host CPU even when the device tunnel is half-open.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    argv = [a for a in sys.argv[1:] if a != "--cpu"]
    if "--cpu" in sys.argv and os.environ.get("_GT_PHASE_CPU") != "1":
        env = dict(os.environ)
        parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                 if p and "axon" not in p]
        env["PYTHONPATH"] = os.pathsep.join(parts)
        env["JAX_PLATFORMS"] = "cpu"
        env["_GT_PHASE_CPU"] = "1"
        os.execve(sys.executable, [sys.executable] + sys.argv, env)

    geom = argv[0] if argv else "1332x774"
    quality = int(argv[1]) if len(argv) > 1 else 95
    w, h = map(int, geom.split("x"))

    import numpy as np
    from PIL import Image

    from guetzli_tpu.runtime import configure
    configure()

    from guetzli_tpu import consts
    from guetzli_tpu.search.processor import (Params, ProcessStats,
                                              process_rgb)

    im = Image.open("/root/reference/tests/bees.png").convert("RGB")
    if (w, h) != im.size:
        im = im.resize((w, h))
    rgb = np.asarray(im, np.uint8)
    p = Params()
    p.butteraugli_target = consts.butteraugli_score_for_quality(quality)

    process_rgb(p, rgb, w, h, ProcessStats())           # warm
    s = ProcessStats()
    t0 = time.time()
    out = process_rgb(p, rgb, w, h, s)
    import jax
    print(json.dumps({
        "wall_s": round(time.time() - t0, 2),
        "bytes": len(out),
        "backend": jax.default_backend(),
        "geom": geom,
        "timings": {k: round(v, 2) for k, v in sorted(s.timings.items())},
        "counters": s.counters,
    }))


if __name__ == "__main__":
    main()
