"""Golden corpus builder + runner (reference tests/golden_test.sh analog).

The reference pins 124 encode variants of a 31-image corpus downloaded
from GCS (tests/golden_test.sh:14-31, golden_checksums.txt). This
deployment has no egress, so the corpus is synthesized deterministically:
crops of the reference's own bees.png plus seeded synthetic textures,
each expanded into the same variant matrix the reference uses — PNG,
444 JPEG, progressive 444 JPEG, 420 JPEG (golden_test.sh:17-21).

Subcommands:
  gen   — write the corpus images into tests/corpus/ (deterministic).
  ref   — encode every variant with the locally-built reference encoder
          (/tmp/refbuild/bin/Release/guetzli) and pin output sizes into
          tests/golden_corpus.txt.
  run   — encode every variant with guetzli-tpu and report size vs the
          pinned reference sizes (the 2% band of SURVEY.md §4 item 2).

The committed tests/corpus/ images + tests/golden_corpus.txt make
tests/test_golden_corpus.py hermetic; this tool only needs re-running to
regenerate or re-pin.
"""

import argparse
import io
import os
import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
CORPUS = REPO / "tests" / "corpus"
GOLDEN = REPO / "tests" / "golden_corpus.txt"
REF_BIN = Path(os.environ.get("GUETZLI_REF_BIN",
                              "/tmp/refbuild/bin/Release/guetzli"))
BEES = Path("/root/reference/tests/bees.png")
QUALITY = 95


def _bees():
    from PIL import Image
    return np.asarray(Image.open(BEES).convert("RGB"))


def _grad(w, h, seed):
    rng = np.random.RandomState(seed)
    a = rng.uniform(0, 255, 3)
    b = rng.uniform(0, 255, 3)
    t = np.linspace(0, 1, w)[None, :, None]
    u = np.linspace(0, 1, h)[:, None, None]
    img = a * (1 - t) + b * t
    img = img * (0.5 + 0.5 * u)
    return img.astype(np.uint8) * np.ones((h, w, 3), np.uint8)


def _plasma(w, h, seed):
    rng = np.random.RandomState(seed)
    y, x = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w, 3))
    for c in range(3):
        acc = np.zeros((h, w))
        for _ in range(4):
            fx, fy = rng.uniform(0.01, 0.2, 2)
            ph = rng.uniform(0, 2 * np.pi)
            acc += np.sin(fx * x + fy * y + ph)
        img[..., c] = acc
    img -= img.min()
    img *= 255.0 / max(img.max(), 1e-9)
    return img.astype(np.uint8)


def _noise(w, h, seed, sigma):
    rng = np.random.RandomState(seed)
    base = _grad(w, h, seed + 1).astype(np.float64)
    out = base + rng.normal(0, sigma, (h, w, 3))
    return np.clip(out, 0, 255).astype(np.uint8)


def _stripes(w, h, seed):
    rng = np.random.RandomState(seed)
    period = rng.randint(3, 9)
    y, x = np.mgrid[0:h, 0:w]
    v = ((x // period + y // (period + 2)) % 2) * 255
    cols = rng.uniform(0, 255, (2, 3))
    return np.where(v[..., None] > 0, cols[0], cols[1]).astype(np.uint8)


def _text(w, h, seed):
    from PIL import Image, ImageDraw
    rng = np.random.RandomState(seed)
    im = Image.new("RGB", (w, h),
                   tuple(int(v) for v in rng.uniform(180, 255, 3)))
    d = ImageDraw.Draw(im)
    fg = tuple(int(v) for v in rng.uniform(0, 80, 3))
    words = ["guetzli", "tpu", "xla", "jpeg", "opsin", "895", "butter"]
    for i in range(rng.randint(6, 12)):
        d.text((rng.randint(0, max(1, w - 40)),
                rng.randint(0, max(1, h - 12))),
               words[rng.randint(len(words))], fill=fg)
    return np.asarray(im)


def _silver(w, h, seed):
    """Mostly-dark frame with bright speckles (the silver-screen
    heuristic's target content, preprocess_downsample.cc:16-38)."""
    rng = np.random.RandomState(seed)
    img = np.full((h, w, 3), 18, np.float64)
    img += rng.normal(0, 6, (h, w, 3))
    for _ in range(w * h // 160):
        cy, cx = rng.randint(0, h), rng.randint(0, w)
        img[max(0, cy - 1):cy + 2, max(0, cx - 1):cx + 2] = \
            rng.uniform(200, 255)
    return np.clip(img, 0, 255).astype(np.uint8)


def corpus_images():
    """[(name, rgb array)] — 30 deterministic images, varied geometry
    (odd sizes exercise the shape-bucket padding)."""
    bees = _bees()
    out = []
    crops = [
        ("bees_a", 0, 0, 160, 120), ("bees_b", 120, 40, 152, 112),
        ("bees_c", 260, 100, 144, 96), ("bees_d", 40, 110, 97, 63),
        ("bees_e", 200, 0, 128, 128), ("bees_f", 300, 60, 133, 101),
        ("bees_g", 10, 60, 120, 90), ("bees_h", 150, 130, 160, 100),
        ("bees_i", 80, 20, 89, 144), ("bees_j", 230, 140, 111, 87),
    ]
    for name, x, y, w, h in crops:
        out.append((name, bees[y:y + h, x:x + w]))
    from PIL import Image
    big = Image.open(BEES).convert("RGB")
    out.append(("bees_up", np.asarray(
        big.resize((222, 129), Image.BILINEAR).crop((30, 10, 160, 110)))))
    out.append(("bees_dn", np.asarray(
        big.resize((111, 64), Image.LANCZOS))))
    sizes = [(96, 96), (120, 80), (97, 63), (144, 108), (64, 160),
             (100, 100)]
    gens = [("grad", _grad), ("plasma", _plasma), ("stripes", _stripes)]
    i = 0
    for gname, fn in gens:
        for j in range(4):
            w, h = sizes[(i + j) % len(sizes)]
            out.append(("%s%d" % (gname, j), fn(w, h, seed=100 + i + j)))
        i += 4
    for j, sigma in enumerate((8, 30)):
        out.append(("noise%d" % j, _noise(112, 84, 200 + j, sigma)))
    for j in range(2):
        out.append(("text%d" % j, _text(128, 96, 300 + j)))
    for j in range(2):
        out.append(("silver%d" % j, _silver(120, 88, 400 + j)))
    assert len(out) == 30, len(out)
    return out


HOPPER = Path("/opt/venv/lib/python3.12/site-packages/matplotlib/"
              "mpl-data/sample_data/grace_hopper.jpg")


def photo_images():
    """[(name, rgb)] — natural-photograph rows (the reference's golden
    corpus is 31 real photos, golden_test.sh:14; this deployment has no
    egress, so the photographic content comes from the two real
    photographs available locally: the reference's own bees.png and
    matplotlib's grace_hopper.jpg portrait). photo_mosaic* are >=1 MPix
    compositions of real-photo crops at varied scales/orientations —
    photographic statistics (sensor noise, skin/fur texture, bokeh)
    rather than synthetic gradients, which is what stresses the masking
    and zeroing phases differently (VERDICT r2 missing #4)."""
    from PIL import Image
    hopper = Image.open(HOPPER).convert("RGB")
    bees = Image.open(BEES).convert("RGB")
    out = [("photo_hopper", np.asarray(hopper))]

    def mosaic(name, w, h, seed):
        rng = np.random.RandomState(seed)
        canvas = Image.new("RGB", (w, h))
        srcs = [hopper, bees]
        # Coarse grid of real-photo crops, each rescaled (and sometimes
        # mirrored) to its cell: every pixel is photographic.
        cols, rows = rng.randint(3, 5), rng.randint(3, 5)
        cw, ch = -(-w // cols), -(-h // rows)
        for gy in range(rows):
            for gx in range(cols):
                src = srcs[rng.randint(2)]
                sw, sh = src.size
                crop_w = rng.randint(sw // 3, sw)
                crop_h = rng.randint(sh // 3, sh)
                x0 = rng.randint(0, sw - crop_w + 1)
                y0 = rng.randint(0, sh - crop_h + 1)
                tile = src.crop((x0, y0, x0 + crop_w, y0 + crop_h)) \
                    .resize((cw, ch), Image.LANCZOS)
                if rng.randint(2):
                    tile = tile.transpose(Image.FLIP_LEFT_RIGHT)
                canvas.paste(tile, (gx * cw, gy * ch))
        return (name, np.asarray(canvas)[:h, :w])

    out.append(mosaic("photo_mosaic1", 1444, 908, seed=9001))  # 1.31 MPix
    out.append(mosaic("photo_mosaic2", 1152, 870, seed=9002))  # 1.00 MPix
    return out


def variants(png_path):
    """The reference's variant matrix for one PNG (golden_test.sh:17-21):
    the PNG itself, 444 q100, progressive 444 q100, 420 q100."""
    from PIL import Image
    stem = png_path.stem
    im = Image.open(png_path).convert("RGB")
    specs = [
        (stem + ".jpg", dict(quality=100, subsampling=0)),
        (stem + "-progressive.jpg",
         dict(quality=100, subsampling=0, progressive=True)),
        (stem + "-420.jpg", dict(quality=100, subsampling=2)),
    ]
    outs = [(png_path.name, png_path.read_bytes())]
    for name, kw in specs:
        buf = io.BytesIO()
        im.save(buf, format="JPEG", **kw)
        outs.append((name, buf.getvalue()))
    return outs


def cmd_gen(_args):
    from PIL import Image
    CORPUS.mkdir(parents=True, exist_ok=True)
    for name, rgb in corpus_images() + photo_images():
        p = CORPUS / (name + ".png")
        Image.fromarray(rgb).save(p, format="PNG", optimize=True)
        for vname, data in variants(p)[1:]:
            (CORPUS / vname).write_bytes(data)
    n = len(list(CORPUS.iterdir()))
    print("wrote %d corpus files to %s" % (n, CORPUS))


def _ref_encode(item):
    name, data, q = item
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=Path(name).suffix) as f, \
            tempfile.NamedTemporaryFile(suffix=".jpg") as fo:
        f.write(data)
        f.flush()
        r = subprocess.run(
            [str(REF_BIN), "--quality", str(q), f.name, fo.name],
            capture_output=True)
        if r.returncode != 0:
            return (name, q), -1
        return (name, q), os.path.getsize(fo.name)


def cmd_ref(args):
    """Pin reference sizes for every (variant, quality) row. The
    BASELINE parity band is quality 84-95 (quality.cc:31-74), so the
    default quality set brackets it: 84, 90, 95."""
    qualities = [int(q) for q in args.qualities.split(",") if q]
    items = []
    for p in sorted(CORPUS.glob("*.png")):
        for name, data in variants(p):
            for q in qualities:
                items.append((name, data, q))
    with ThreadPoolExecutor(max_workers=os.cpu_count()) as pool:
        sizes = dict(pool.map(_ref_encode, items))
    with open(GOLDEN, "w") as f:
        f.write("# input  quality  ref_bytes  (local reference build, "
                "%s)\n" % REF_BIN)
        for name, _d, q in items:
            f.write("%-28s %d  %d\n" % (name, q, sizes[(name, q)]))
    bad = [k for k, s in sizes.items() if s < 0]
    print("pinned %d rows to %s (%d reference failures)"
          % (len(items), GOLDEN, len(bad)))
    for n in bad:
        print("  REF FAILED:", n)


def load_golden():
    rows = []
    for line in GOLDEN.read_text().splitlines():
        if not line.strip() or line.startswith("#"):
            continue
        name, q, size = line.split()
        rows.append((name, int(q), int(size)))
    return rows


def cmd_run(args):
    sys.path.insert(0, str(REPO))
    # The axon plugin's sitecustomize imports jax at interpreter start
    # with JAX_PLATFORMS=axon, and its client init hangs when the TPU
    # tunnel is wedged; force_cpu() pins both the env AND the jax config
    # (the env alone is too late once jax is imported).
    from guetzli_tpu.runtime import configure, force_cpu
    if args.cpu:
        force_cpu()
    configure()
    from guetzli_tpu.parallel.api import encode_bytes
    rows = load_golden()
    if args.quality:
        rows = [r for r in rows if r[1] == args.quality]
    if args.match:
        rows = [r for r in rows if args.match in r[0]]
    if args.sample:
        rows = rows[::args.sample]
    worst = 0.0
    fails = []
    for name, q, ref_size in rows:
        data = (CORPUS / name).read_bytes()
        out = encode_bytes(data, quality=q)  # per-row quality
        dev = abs(len(out) - ref_size) / ref_size
        worst = max(worst, dev)
        status = "ok" if dev <= args.band else "FAIL"
        if status == "FAIL":
            fails.append(name)
        print("%-28s ours=%-7d ref=%-7d dev=%+.2f%% %s"
              % (name, len(out), ref_size,
                 100.0 * (len(out) - ref_size) / ref_size, status))
    print("%d rows, worst deviation %.2f%%, %d failures"
          % (len(rows), worst * 100, len(fails)))
    return 1 if fails else 0


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("gen")
    refp = sub.add_parser("ref")
    refp.add_argument("--qualities", default="84,90,95")
    runp = sub.add_parser("run")
    runp.add_argument("--band", type=float, default=0.02)
    runp.add_argument("--cpu", action="store_true",
                      help="pin the CPU backend (wedged-tunnel escape)")
    runp.add_argument("--sample", type=int, default=0,
                      help="take every Nth row only")
    runp.add_argument("--match", default="",
                      help="only rows whose name contains this substring")
    runp.add_argument("--quality", type=int, default=0,
                      help="only rows at this quality")
    args = ap.parse_args()
    return {"gen": cmd_gen, "ref": cmd_ref, "run": cmd_run}[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main() or 0)
