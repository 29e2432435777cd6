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


def _peek_geometry(data: bytes):
    """(w, h) without decoding pixel data, or None."""
    if data[:2] == b"\xff\xd8":
        from guetzli_tpu.codec.reader import peek_dimensions
        return peek_dimensions(data)
    try:
        import io as _io

        from PIL import Image
        with Image.open(_io.BytesIO(data)) as im:
            return im.size
    except Exception:
        return None


def encode_corpus(inputs, quality: float = 95, params: Params = None,
                  verbose: bool = False, threads: int = 1):
    """Encode a corpus of images.

    Args:
      inputs: iterable of (name, bytes) pairs.
      quality: libjpeg-style quality (>= 84).
      threads: concurrent encodes. Each image's search is host-driven with
        blocking device fetches; with several images in flight the fetch
        waits overlap (one image's host work and device round trips hide
        another's), which is where tunneled-TPU latency goes. Device work
        itself is serialized by the single chip.
    Returns:
      list of (name, jpeg_bytes_or_None, seconds).

    Images are geometry-bucketed so XLA executables are reused; the first
    image of each geometry is encoded alone to warm the jit caches before
    concurrency begins.
    """
    from guetzli_tpu.runtime import configure
    configure()
    items = list(inputs)
    geoms = [_peek_geometry(d) for _, d in items]
    order = sorted(range(len(items)),
                   key=lambda i: (geoms[i] is None, geoms[i] or (0, 0),
                                  len(items[i][1])))
    results = [None] * len(items)

    def encode_one(i):
        name, data = items[i]
        t0 = time.time()
        try:
            out = encode_bytes(data, quality, params)
        except Exception as e:       # keep the corpus going (per-image
            sys.stderr.write(f"{name}: {e}\n")   # isolation is the analog
            out = None                           # of xargs -P processes)
        dt = time.time() - t0
        if verbose:
            n = len(out) if out else 0
            sys.stderr.write(f"{name}: {n} bytes in {dt:.1f}s\n")
        results[i] = (name, out, dt)

    if threads <= 1:
        for i in order:
            encode_one(i)
        return results

    import concurrent.futures as cf
    seen_geom = set()
    warm, rest = [], []
    for i in order:
        g = geoms[i]
        if g not in seen_geom:
            seen_geom.add(g)
            warm.append(i)
        else:
            rest.append(i)
    for i in warm:                   # compile caches, one per geometry
        encode_one(i)
    with cf.ThreadPoolExecutor(max_workers=threads) as ex:
        list(ex.map(encode_one, rest))
    return results
