"""PNG ingest with the reference CLI's semantics (guetzli.cc:47-153).

The reference uses libpng with PACKING|EXPAND|STRIP_16 transforms and blends
alpha on black with integer rounding `(val*alpha + 128) / 255`
(guetzli.cc:47-49). Decoding is delegated to Pillow (the libpng analog in
this image); the channel handling and blending reproduce the reference
exactly.
"""

import io

import numpy as np


def blend_on_black(val, alpha):
    """guetzli.cc:47-49, vectorized."""
    return ((val.astype(np.int32) * alpha.astype(np.int32) + 128) // 255) \
        .astype(np.uint8)


def read_png(data: bytes):
    """Decode PNG bytes -> (rgb uint8 [h, w, 3], width, height)."""
    from PIL import Image
    im = Image.open(io.BytesIO(data))
    if im.mode == "P":
        im = im.convert("RGBA" if "transparency" in im.info else "RGB")
    if im.mode in ("I", "I;16", "I;16B"):
        arr = np.asarray(im, dtype=np.uint16)
        im = Image.fromarray((arr >> 8).astype(np.uint8), mode="L")
    arr = np.asarray(im)
    if im.mode == "L":
        rgb = np.repeat(arr[:, :, None], 3, axis=2)
    elif im.mode == "LA":
        gray = blend_on_black(arr[:, :, 0], arr[:, :, 1])
        rgb = np.repeat(gray[:, :, None], 3, axis=2)
    elif im.mode == "RGB":
        rgb = arr
    elif im.mode == "RGBA":
        rgb = blend_on_black(arr[:, :, :3], arr[:, :, 3:4])
    else:
        im = im.convert("RGB")
        rgb = np.asarray(im)
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w = rgb.shape[:2]
    return rgb, w, h
