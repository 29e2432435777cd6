"""Golden regression driver: encode the fixture corpus and compare sizes
against the reference encoder's outputs (golden_checksums.txt). One
process for all encodes (shared jit caches). See golden_test.sh."""

import io
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))




def _ensure_backend():
    """Fall back to CPU when the accelerator tunnel is wedged or silently
    absent (see runtime.accelerator_reachable)."""
    from guetzli_tpu import runtime
    if not runtime.accelerator_reachable():
        runtime.force_cpu()
        print("accelerator unreachable; running on CPU")

def main():
    _ensure_backend()
    from guetzli_tpu import consts
    from guetzli_tpu.io.png import read_png
    from guetzli_tpu.runtime import configure
    from guetzli_tpu.search.processor import (Params, ProcessStats,
                                              process_rgb)
    configure()

    fail = 0
    table = (REPO / "tests" / "golden_checksums.txt").read_text()
    for line in table.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        img, q, ref_bytes, _ref_d = line.split()
        q = int(q)
        ref_bytes = int(ref_bytes)
        rgb, w, h = read_png(
            (REPO / "tests" / "fixtures" / img).read_bytes())
        params = Params()
        params.butteraugli_target = consts.butteraugli_score_for_quality(q)
        out = process_rgb(params, rgb, w, h, ProcessStats())
        from PIL import Image
        im = Image.open(io.BytesIO(out))
        im.load()
        lo, hi = ref_bytes * 0.975, ref_bytes * 1.025
        if not (lo <= len(out) <= hi):
            print(f"FAIL size {img} q{q}: got {len(out)}, "
                  f"reference {ref_bytes} (band {lo:.0f}-{hi:.0f})")
            fail = 1
        else:
            print(f"OK {img} q{q}: {len(out)} bytes (ref {ref_bytes})")
    print("golden test", "FAILED" if fail else "OK")
    return fail


if __name__ == "__main__":
    sys.exit(main())
