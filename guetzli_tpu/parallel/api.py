"""Corpus encoding API: many images through one process/device.

The reference parallelizes corpora with `xargs -P nproc` over processes
(tests/golden_test.sh:25) -- one image per process, every process paying
its own startup. Here a corpus shares one process: XLA executables are
cached per image geometry (plus the persistent on-disk cache), so batches
of same-sized images pay compilation once, and each image's device state
is freed before the next begins.

Multi-host scaling composes on top: launch one corpus worker per host with
`jax.distributed.initialize()` and shard the file list by
`jax.process_index()` -- encoding is embarrassingly parallel across images,
so host workers need no communication (the in-search collectives stay
within each host's chips).
"""

import sys
import time

from guetzli_tpu import consts
from guetzli_tpu.search.processor import (Params, ProcessStats,
                                          process_jpeg_bytes, process_rgb)


def encode_bytes(data: bytes, quality: float = 95,
                 params: Params = None, stats: ProcessStats = None):
    """Encode one PNG/JPEG input; returns JPEG bytes or None."""
    params = params or Params()
    params.butteraugli_target = consts.butteraugli_score_for_quality(quality)
    stats = stats or ProcessStats()
    if data[:2] == b"\xff\xd8":
        return process_jpeg_bytes(params, data, stats)
    from guetzli_tpu.io.png import read_png
    rgb, w, h = read_png(data)
    return process_rgb(params, rgb, w, h, stats)


def encode_corpus(inputs, quality: float = 95, params: Params = None,
                  verbose: bool = False):
    """Encode a corpus of images.

    Args:
      inputs: iterable of (name, bytes) pairs.
      quality: libjpeg-style quality (>= 84).
    Returns:
      list of (name, jpeg_bytes_or_None, seconds).

    Images are size-bucketed so geometries repeat back-to-back and reuse
    live jit caches.
    """
    from guetzli_tpu.runtime import configure
    configure()
    items = list(inputs)
    # Bucket by input size as a cheap geometry proxy (exact geometry needs
    # decoding; same-dimension images usually have similar byte sizes).
    order = sorted(range(len(items)), key=lambda i: len(items[i][1]))
    results = [None] * len(items)
    for i in order:
        name, data = items[i]
        t0 = time.time()
        try:
            out = encode_bytes(data, quality, params)
        except Exception as e:       # keep the corpus going (per-image
            sys.stderr.write(f"{name}: {e}\n")   # retry is the analog of
            out = None                           # the ref's fallback output)
        dt = time.time() - t0
        if verbose:
            n = len(out) if out else 0
            sys.stderr.write(f"{name}: {n} bytes in {dt:.1f}s\n")
        results[i] = (name, out, dt)
    return results
