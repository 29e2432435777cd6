#!/usr/bin/env python
"""Scaling-efficiency harness: measured throughput-vs-workers curves for
the corpus encode (BASELINE.md target: >=0.8 efficiency on >=2 hosts).

Two axes, both runnable without TPU hardware:

  * processes: the corpus is sharded over P single-backend processes
    (tools/corpus_encode.py --num-hosts P --host-index i), the reference
    golden test's xargs -P model lifted to hosts. Efficiency here is a
    REAL measurement on any multi-core host: the per-image searches are
    independent, so this is the multi-host story modulo network I/O
    (there is none: inputs are local files).
  * mesh: one image encoded with GSPMD sharding over {1,2,..} devices
    (--mesh N). On virtual CPU devices all "devices" share the same
    physical cores, so the curve is INFORMATIONAL on CPU (contention
    masks the collective overheads it is supposed to measure); on real
    multi-chip hardware the same command produces the honest curve.

Usage:
  python tools/scaling_bench.py [--procs 1,2,4] [--images N] [--repeat R]
                                [--mesh 1,2,4] [--out FILE]

Prints one JSON object with both curves and the derived efficiencies.
"""

import json
import os
import pathlib
import subprocess
import sys
import tempfile
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _corpus(n):
    """n small real-image inputs (fixture crops cycled)."""
    fx = REPO / "tests" / "fixtures"
    names = ["bees96x64.png", "bees97x63.png", "synth128x96.png"]
    return [(fx / names[i % len(names)]) for i in range(n)]


def _run_shard(paths, num_hosts, host_index, out_dir):
    env = dict(os.environ)
    # CPU pin exactly as the test conftest does; each process is an
    # independent single-backend worker. One intra-op thread per worker:
    # the XLA CPU backend otherwise fans each process out over every
    # core, so P>1 would measure oversubscription, not worker scaling.
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_cpu_multi_thread_eigen=false "
                          "intra_op_parallelism_threads=1").strip()
    env["OMP_NUM_THREADS"] = "1"
    env["OPENBLAS_NUM_THREADS"] = "1"
    cmd = [sys.executable, str(REPO / "tools" / "corpus_encode.py"),
           "--cpu", "--quality", "95", "--out", out_dir,
           "--num-hosts", str(num_hosts), "--host-index", str(host_index),
           ] + [str(p) for p in paths]
    return subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.DEVNULL)


def run_process_curve(proc_counts, n_images, repeat):
    paths = _corpus(n_images)
    results = {}
    for p in proc_counts:
        walls = []
        for _ in range(repeat):
            with tempfile.TemporaryDirectory() as td:
                t0 = time.time()
                procs = [_run_shard(paths, p, i, td) for i in range(p)]
                outs = [pr.communicate()[0] for pr in procs]
                wall = time.time() - t0
                assert all(pr.returncode == 0 for pr in procs), outs
                n_ok = sum(json.loads(o.splitlines()[-1])["encoded"]
                           for o in outs)
                assert n_ok == n_images, (n_ok, n_images)
            walls.append(wall)
        results[p] = min(walls)
    base = results[proc_counts[0]] * proc_counts[0]
    curve = []
    for p in proc_counts:
        thr = n_images / results[p]
        curve.append({
            "procs": p,
            "wall_s": round(results[p], 2),
            "images_per_min": round(60.0 * thr, 2),
            "efficiency": round(base / (p * results[p]), 3),
        })
    return curve


def run_mesh_curve(mesh_counts, repeat):
    img = str(REPO / "tests" / "fixtures" / "bees96x64.png")
    curve = []
    for n in mesh_counts:
        walls = []
        out_ref = None
        for _ in range(repeat):
            with tempfile.NamedTemporaryFile(suffix=".jpg") as tf:
                env = dict(os.environ)
                env["JAX_PLATFORMS"] = "cpu"
                env["XLA_FLAGS"] = (
                    env.get("XLA_FLAGS", "")
                    + " --xla_force_host_platform_device_count=8").strip()
                env["GUETZLI_TPU_MESH"] = str(n)
                t0 = time.time()
                r = subprocess.run(
                    [sys.executable, "-m", "guetzli_tpu.cli", "--cpu",
                     "--quality", "95", img, tf.name],
                    env=env, cwd=str(REPO), capture_output=True)
                walls.append(time.time() - t0)
                assert r.returncode == 0, r.stderr[-500:]
                out = open(tf.name, "rb").read()
                if out_ref is None:
                    out_ref = out
                assert out == out_ref, "mesh output diverged"
        curve.append({"mesh": n, "wall_s": round(min(walls), 2),
                      "outputs_identical": True})
    return curve


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", default="1,2,4")
    ap.add_argument("--images", type=int, default=8)
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--mesh", default="1,2,4")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    result = {"host_cpus": os.cpu_count()}
    pc = [int(x) for x in args.procs.split(",") if x]
    if pc:
        result["process_curve"] = run_process_curve(
            pc, args.images, args.repeat)
    mc = [int(x) for x in args.mesh.split(",") if x]
    if mc:
        result["mesh_curve"] = run_mesh_curve(mc, args.repeat)
        result["mesh_note"] = ("virtual CPU devices share physical "
                               "cores: informational only off-hardware")
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
