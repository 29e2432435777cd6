"""Corpus encoder: encode a directory (or file list) of images.

Single-host: sequential size-bucketed encoding sharing jit caches
(parallel/api.py). Multi-host: run one instance per host with
--num-hosts/--host-index (or let jax.distributed supply them); the file
list is sharded by index, the embarrassing parallelism of the reference's
`xargs -P` golden test (tests/golden_test.sh:25) lifted to hosts.

Usage:
  python tools/corpus_encode.py --quality 95 --out DIR inputs...
  python tools/corpus_encode.py --num-hosts 4 --host-index 2 ...
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("inputs", nargs="+")
    ap.add_argument("--quality", type=float, default=95)
    ap.add_argument("--out", required=True)
    ap.add_argument("--num-hosts", type=int, default=1)
    ap.add_argument("--host-index", type=int, default=0)
    ap.add_argument("--distributed", action="store_true",
                    help="initialize jax.distributed and derive host "
                         "index/count from the process environment")
    ap.add_argument("--coordinator", default=None,
                    help="coordinator address for jax.distributed "
                         "(host:port); with --num-hosts/--host-index it "
                         "forms an explicit 2+-process CPU/TPU cluster")
    ap.add_argument("--cpu", action="store_true",
                    help="pin the CPU backend (no accelerator probe)")
    ap.add_argument("--threads", type=int, default=None,
                    help="concurrent encodes per host (overlaps device "
                         "round trips across images); default: one per "
                         "image up to 16 under lockstep, 1 serial")
    ap.add_argument("--lockstep", action="store_true",
                    help="(default; kept for compatibility)")
    ap.add_argument("--serial", action="store_true",
                    help="per-image sequential encoding instead of the "
                         "lockstep corpus search (debugging/AB only; the "
                         "lockstep path produces byte-identical outputs "
                         "with one dispatch wave per search round)")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        from guetzli_tpu import runtime
        runtime.force_cpu()
    if args.distributed:
        import jax
        if args.coordinator:
            jax.distributed.initialize(
                coordinator_address=args.coordinator,
                num_processes=args.num_hosts,
                process_id=args.host_index)
        else:
            jax.distributed.initialize()
        args.num_hosts = jax.process_count()
        args.host_index = jax.process_index()
    elif not args.cpu:
        # Long-running batch job: spend a probe up front rather than hang
        # forever on a wedged accelerator tunnel.
        from guetzli_tpu import runtime
        if not runtime.accelerator_reachable():
            runtime.force_cpu()
            sys.stderr.write("accelerator unreachable; encoding on CPU\n")

    from guetzli_tpu import runtime as _rt
    _rt.configure()        # persistent compile cache + stable cache keys

    paths = []
    for p in args.inputs:
        p = pathlib.Path(p)
        if p.is_dir():
            paths.extend(sorted(
                q for q in p.iterdir()
                if q.suffix.lower() in (".png", ".jpg", ".jpeg")))
        else:
            paths.append(p)
    mine = [p for i, p in enumerate(paths)
            if i % args.num_hosts == args.host_index]

    out_dir = pathlib.Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    t0 = time.time()
    items = [(p.name, p.read_bytes()) for p in mine]
    if not args.serial:
        # Lockstep is THE corpus path (bench.py's batch metric uses the
        # same driver): back-end threads default to one per image so the
        # corpus batcher coalesces full-width compare waves.
        threads = args.threads or max(1, min(len(items), 16))
        from guetzli_tpu.parallel.lockstep import encode_corpus_lockstep
        results = [(n, d, 0.0)
                   for n, d in encode_corpus_lockstep(
                       items, quality=args.quality,
                       threads=threads)]
    else:
        from guetzli_tpu.parallel.api import encode_corpus
        results = encode_corpus(items, quality=args.quality,
                                verbose=args.verbose,
                                threads=args.threads or 1)
    wall = time.time() - t0

    ok = 0
    total_bytes = 0
    for name, data, dt in results:
        if data is None:
            continue
        (out_dir / (pathlib.Path(name).stem + ".jpg")).write_bytes(data)
        ok += 1
        total_bytes += len(data)
    print(json.dumps({
        "host": args.host_index, "images": len(mine), "encoded": ok,
        "bytes": total_bytes, "wall_s": round(wall, 2),
        "images_per_min": round(60.0 * ok / wall, 2) if wall else None,
    }))
    return 0 if ok == len(mine) else 1


if __name__ == "__main__":
    sys.exit(main())
