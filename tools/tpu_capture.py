#!/usr/bin/env python
"""One-shot TPU evidence capture: run everything that needs the real chip.

The tunneled TPU can wedge for hours; when it comes back this captures all
TPU-blocked measurements in one go, most valuable first, each phase
independently fault-isolated:

  1. bench.py (headline MPix/s + MFU fields)  -> stdout JSON + tpu_bench.json
  2. 1 MPix phase split (quant/zeroing/backend + per-phase wall)
  3. Pallas tile-compare Mosaic AOT compile retry (legacy blocks-leading kernel; the PALLAS_DOT knob was deleted in r05 and is ignored)
  4. Lockstep corpus throughput (img/min, vs serial)

Usage: python tools/tpu_capture.py [--skip-corpus] [--out PREFIX]
Writes PREFIX_{bench,phases,pallas,corpus}.json (default /tmp/tpu_capture).
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, timeout, env=None):
    e = dict(os.environ)
    if env:
        e.update(env)
    try:
        r = subprocess.run(cmd, cwd=REPO, timeout=timeout,
                           capture_output=True, text=True, env=e)
        return r.returncode, r.stdout, r.stderr
    except subprocess.TimeoutExpired as ex:
        out = ex.stdout or ""
        if isinstance(out, bytes):
            out = out.decode("utf-8", "replace")
        return -1, out, "TIMEOUT %ss" % timeout


def probe():
    rc, out, _ = run([sys.executable, "-c",
                      "import jax; d=jax.devices()[0]; print(d.platform); "
                      "import jax.numpy as jnp; "
                      "assert float(jnp.ones((8,8)).sum())==64."], 300)
    plat = out.strip()
    return rc == 0 and plat not in ("", "cpu"), plat


def main():
    skip_corpus = "--skip-corpus" in sys.argv
    prefix = "/tmp/tpu_capture"
    if "--out" in sys.argv:
        prefix = sys.argv[sys.argv.index("--out") + 1]

    ok, plat = probe()
    print(json.dumps({"probe_ok": ok, "platform": plat}))
    if not ok:
        return 1

    results = {}

    # 1. Headline bench.
    t0 = time.time()
    rc, out, err = run([sys.executable, "bench.py"], 3600)
    line = [ln for ln in out.splitlines() if ln.startswith("{")]
    results["bench"] = {"rc": rc, "wall": round(time.time() - t0, 1),
                        "json": json.loads(line[-1]) if line else None,
                        "stderr_tail": err[-500:]}
    with open(prefix + "_bench.json", "w") as f:
        json.dump(results["bench"], f)
    print(json.dumps(results["bench"]))

    # 2. Phase splits (finer stats.timings: quant_device/quant_host/
    # zeroing_aux/zeroing_loop/backend_flips/backend_serialize/
    # backend_fetch). bees first (fast, banks the fine split early),
    # then 1 MPix.
    phase_code = (
        "import time, json, sys; "
        "from guetzli_tpu import consts; "
        "from guetzli_tpu.search.processor import Params, ProcessStats, "
        "process_rgb; "
        "import numpy as np; from PIL import Image; "
        "im = Image.open('/root/reference/tests/bees.png').convert('RGB'); "
        "w, h = map(int, sys.argv[1:3]); "
        "im = im.resize((w, h)) if (w, h) != im.size else im; "
        "rgb = np.asarray(im, np.uint8); "
        "p = Params(); "
        "p.butteraugli_target = consts.butteraugli_score_for_quality(95); "
        "process_rgb(p, rgb, w, h, ProcessStats()); "
        "s = ProcessStats(); t0 = time.time(); "
        "out = process_rgb(p, rgb, w, h, s); "
        "print(json.dumps({'wall_s': round(time.time()-t0,2), "
        "'bytes': len(out), 'timings': {k: round(v,2) for k,v in "
        "s.timings.items()}, 'counters': s.counters}))")
    for tag, (w, h), tmo in (("phases_bees", (444, 258), 1800),
                             ("phases_1mpix", (1332, 774), 7200)):
        t0 = time.time()
        rc, out, err = run([sys.executable, "-c", phase_code,
                            str(w), str(h)], tmo)
        line = [ln for ln in out.splitlines() if ln.startswith("{")]
        results[tag] = {
            "rc": rc, "wall": round(time.time() - t0, 1),
            "json": json.loads(line[-1]) if line else None,
            "stderr_tail": err[-500:]}
        with open("%s_%s.json" % (prefix, tag), "w") as f:
            json.dump(results[tag], f)
        print(json.dumps(results[tag]))

    # 2b. Per-stage compare profile (where do the fused-compare ms go).
    for tag, geom in (("profile_bees", "444x258"),
                      ("profile_1mpix", "1332x774")):
        t0 = time.time()
        rc, out, err = run([sys.executable, "tools/compare_profile.py",
                            geom], 3600)
        line = [ln for ln in out.splitlines() if ln.startswith("{")]
        results[tag] = {"rc": rc, "wall": round(time.time() - t0, 1),
                        "json": json.loads(line[-1]) if line else None,
                        "stderr_tail": err[-400:]}
        with open("%s_%s.json" % (prefix, tag), "w") as f:
            json.dump(results[tag], f)
        print(json.dumps(results[tag]))

    # 3. 8 MPix large-image encode (validates the lane-clean
    # blocks_to_plane + HBM-budgeted quant wave OOM fixes).
    t0 = time.time()
    rc, out, err = run([sys.executable, "tools/large_encode.py",
                        "--mpix", "8"], 7200)
    results["large"] = {"rc": rc, "wall": round(time.time() - t0, 1),
                        "out_tail": out[-800:],
                        "stderr_tail": err[-500:]}
    with open(prefix + "_large.json", "w") as f:
        json.dump(results["large"], f)
    print(json.dumps(results["large"]))

    # 4. Lockstep corpus throughput.
    if not skip_corpus:
        t0 = time.time()
        import glob as _glob
        inputs = sorted(_glob.glob(
            os.path.join(REPO, "tests/fixtures/bees*.png")))
        rc, out, err = run(
            [sys.executable, "tools/corpus_encode.py", "--lockstep",
             "--out", "/tmp/tpu_corpus"] + inputs, 3600)
        results["corpus"] = {"rc": rc, "wall": round(time.time() - t0, 1),
                             "out_tail": out[-800:],
                             "stderr_tail": err[-500:]}
        with open(prefix + "_corpus.json", "w") as f:
            json.dump(results["corpus"], f)
        print(json.dumps(results["corpus"]))

    # 5. LAST (long compile; killing it mid-compile is a suspected tunnel
    # wedge trigger, so everything above must already be banked): Pallas
    # Mosaic AOT work. First the stage-ladder bisect (pinpoints the op
    # class Mosaic aborts on -- one window localizes it instead of
    # re-observing an opaque SIGABRT), then the full checkcl retry only
    # if the ladder's "full" stage compiled.
    full_ok = {}
    for dot_flag in ([], ["--dot"]):
        t0 = time.time()
        rc, out, err = run([sys.executable, "tools/pallas_bisect.py"]
                           + dot_flag, 5400)
        tag = "bisect_dot%d" % bool(dot_flag)
        lines = [ln for ln in out.splitlines() if ln.startswith("{")]
        results[tag] = {"rc": rc, "wall": round(time.time() - t0, 1),
                        "lines": lines, "stderr_tail": err[-400:]}
        with open("%s_%s.json" % (prefix, tag), "w") as f:
            json.dump(results[tag], f)
        print(json.dumps(results[tag]))
        try:
            summary = json.loads(lines[-1]) if lines else {}
            full_ok[bool(dot_flag)] = summary.get("results", {}).get(
                "full", False)
        except Exception:
            full_ok[bool(dot_flag)] = False
        if full_ok[bool(dot_flag)]:
            break
    if not any(full_ok.values()):
        return 0
    for dot in ("0", "1"):
        rc, out, err = run(
            [sys.executable, "-m", "guetzli_tpu.cli", "--checkcl",
             "--quality", "95", "tests/fixtures/bees96x64.png",
             "/tmp/tpu_checkcl.jpg"], 2400,
            env={"GUETZLI_TPU_PALLAS_DOT": dot, "GUETZLI_TPU_PALLAS": "1"})
        tile_rows = [ln for ln in (out + err).splitlines()
                     if "tile_compare" in ln]
        results["pallas_dot%s" % dot] = {
            "rc": rc, "tile_rows": tile_rows, "stderr_tail": err[-800:]}
        with open("%s_pallas_dot%s.json" % (prefix, dot), "w") as f:
            json.dump(results["pallas_dot%s" % dot], f)
        print(json.dumps(results["pallas_dot%s" % dot]))
        ok = any("OK" in r or "ok" in r for r in tile_rows)
        if ok:
            break

    return 0


if __name__ == "__main__":
    sys.exit(main())
