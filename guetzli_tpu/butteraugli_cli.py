"""Standalone butteraugli distance CLI (analog of the reference's
third_party/butteraugli/butteraugli_main.cc, which its build doesn't ship
but which documents the expected tool surface).

Usage: python -m guetzli_tpu.butteraugli_cli {image1} {image2} [heatmap.pnm]

Prints the butteraugli distance between the two images; optionally writes
the per-pixel diffmap as a portable anymap heatmap.
"""

import sys

import numpy as np


def _load_image(path):
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] == b"\xff\xd8":
        from guetzli_tpu.codec import reader
        from guetzli_tpu.search.processor import decode_jpeg_to_rgb
        jpg = reader.read_jpeg(data)
        rgb = decode_jpeg_to_rgb(jpg)
        if rgb is None:
            raise ValueError("unsupported JPEG: %s" % path)
        return rgb, jpg.width, jpg.height
    from guetzli_tpu.io.png import read_png
    return read_png(data)


def compute_distance(rgb0, rgb1, w, h):
    """Distance + diffmap [H, W] between two uint8 [h, w, 3] images."""
    import jax.numpy as jnp

    from guetzli_tpu import consts
    from guetzli_tpu.ops import diffmap as dm
    from guetzli_tpu.ops.opsin import opsin_dynamics_image

    lut = consts.SRGB_TO_LINEAR.astype(np.float32)
    xyb0 = opsin_dynamics_image(jnp.asarray(lut[rgb0].transpose(2, 0, 1)))
    xyb1 = opsin_dynamics_image(jnp.asarray(lut[rgb1].transpose(2, 0, 1)))
    dmap = dm.diffmap_opsin_dynamics(xyb0, xyb1)
    return float(dm.score_from_diffmap(dmap)), np.asarray(dmap)


def _write_heatmap(path, dmap):
    """Simple grayscale PGM of the diffmap scaled to its max."""
    h, w = dmap.shape
    peak = max(float(dmap.max()), 1e-9)
    img = np.clip(dmap / peak * 255.0, 0, 255).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"P5\n%d %d\n255\n" % (w, h))
        f.write(img.tobytes())


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] == "--cpu":
        from guetzli_tpu.runtime import force_cpu
        force_cpu()
        argv = argv[1:]
    if len(argv) not in (2, 3):
        sys.stderr.write(
            "Usage: butteraugli [--cpu] {image1} {image2} [heatmap.pgm]\n")
        return 1
    rgb0, w0, h0 = _load_image(argv[0])
    rgb1, w1, h1 = _load_image(argv[1])
    if (w0, h0) != (w1, h1):
        sys.stderr.write("Images must have the same size\n")
        return 1
    distance, dmap = compute_distance(rgb0, rgb1, w0, h0)
    print("%.6f" % distance)
    if len(argv) == 3:
        _write_heatmap(argv[2], dmap)
    return 0


if __name__ == "__main__":
    sys.exit(main())
