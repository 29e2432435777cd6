#!/usr/bin/env python
"""Pinned repro: the deployment's device client leaks HOST mirrors of
h2d uploads (VERDICT r04 weak-item 3 asked for this as a standalone
artifact). Uploads N x 8 MB distinct buffers, deleting every reference
and gc'ing + malloc_trim'ing after each; reports RSS growth per upload
vs tracemalloc (Python-side) growth. On a healthy client RSS growth ~ 0;
here it tracks upload bytes ~1:1, which is what dominates the 8 MPix
encode's ~10 GB RSS (the encoder's own working set is ~84 MB,
NOTES.md)."""

import gc
import json
import os
import sys
import tracemalloc

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0


def main():
    from guetzli_tpu.runtime import configure
    configure()
    import jax
    import jax.numpy as jnp
    import numpy as np
    dev = jax.devices()[0]
    n, mb = 40, 8
    buf_elems = mb << 18                    # mb MB of f32
    jax.block_until_ready(jnp.zeros(8))     # init runtime
    tracemalloc.start()
    gc.collect()
    r0 = rss_mb()
    t0, _ = tracemalloc.get_traced_memory()
    for i in range(n):
        host = np.full(buf_elems, i, np.float32)
        d = jax.device_put(host, dev)
        jax.block_until_ready(d)
        del host, d
        gc.collect()
        try:
            import ctypes
            ctypes.CDLL("libc.so.6").malloc_trim(0)
        except Exception:
            pass
    r1 = rss_mb()
    t1, _ = tracemalloc.get_traced_memory()
    uploaded = n * mb
    out = {
        "backend": jax.default_backend(),
        "uploads": n, "upload_mb_each": mb, "uploaded_mb": uploaded,
        "rss_before_mb": round(r0, 1), "rss_after_mb": round(r1, 1),
        "rss_growth_mb": round(r1 - r0, 1),
        "rss_growth_per_uploaded_byte": round((r1 - r0) / uploaded, 3),
        "tracemalloc_growth_mb": round((t1 - t0) / 1e6, 1),
        "note": "growth ratio ~1.0 = every upload's host staging copy "
                "is retained by the device client despite del+gc+"
                "malloc_trim; ~0.0 = healthy client",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
