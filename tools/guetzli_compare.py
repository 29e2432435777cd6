"""Compare guetzli-tpu against another encoder's output at equal quality.

Analog of the reference's tools/guetzli-compare.py (:23-49): bisect on
guetzli quality (84..110) until our output's butteraugli distance beats the
competing JPEG's distance to the source, then report the file sizes.

Usage: python tools/guetzli_compare.py source.png competitor.jpg
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) != 2:
        sys.stderr.write(__doc__)
        return 1
    src_path, comp_path = argv

    from guetzli_tpu import consts
    from guetzli_tpu.butteraugli_cli import _load_image, compute_distance
    from guetzli_tpu.search.processor import (Params, ProcessStats,
                                              process_rgb)

    src, w, h = _load_image(src_path)
    comp, cw, ch = _load_image(comp_path)
    if (w, h) != (cw, ch):
        sys.stderr.write("size mismatch\n")
        return 1
    target_dist, _ = compute_distance(src, comp, w, h)
    with open(comp_path, "rb") as f:
        comp_size = len(f.read())
    print(f"competitor: {comp_size} bytes, distance {target_dist:.4f}")

    lo, hi = 84, 110
    best = None
    while lo <= hi:
        q = (lo + hi) // 2
        params = Params()
        params.butteraugli_target = consts.butteraugli_score_for_quality(q)
        out = process_rgb(params, src, w, h, ProcessStats())
        import io
        from PIL import Image
        import numpy as np
        dec = np.asarray(Image.open(io.BytesIO(out)).convert("RGB"))
        dist, _ = compute_distance(src, dec, w, h)
        print(f"  q={q}: {len(out)} bytes, distance {dist:.4f}")
        if dist <= target_dist:
            best = (q, len(out), dist)
            hi = q - 1
        else:
            lo = q + 1
    if best is None:
        print("guetzli-tpu could not beat the competitor's distance")
        return 1
    q, size, dist = best
    ratio = 100.0 * (comp_size - size) / comp_size
    print(f"guetzli-tpu q={q}: {size} bytes at distance {dist:.4f} "
          f"({ratio:+.1f}% vs competitor)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
