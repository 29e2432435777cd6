"""PNG ingest with the reference CLI's semantics (guetzli.cc:47-153).

The reference uses libpng with PACKING|EXPAND|STRIP_16 transforms and blends
alpha on black with integer rounding `(val*alpha + 128) / 255`
(guetzli.cc:47-49). The primary decoder is our native C++ one
(native/src/png_decode.cc, the libpng analog: zlib inflate, all five
filters, Adam7, palette/tRNS, 16-bit strip); Pillow is the fallback when
the toolchain is missing. Both reproduce the reference's channel handling
and blending exactly.
"""

import ctypes
import io

import numpy as np

from guetzli_tpu import native


def blend_on_black(val, alpha):
    """guetzli.cc:47-49, vectorized."""
    return ((val.astype(np.int32) * alpha.astype(np.int32) + 128) // 255) \
        .astype(np.uint8)


def _read_png_native(data: bytes):
    lib = native.get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(data, dtype=np.uint8)
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    rc = lib.gt_png_dims(buf.ctypes.data_as(ctypes.c_void_p),
                         ctypes.c_int64(len(data)),
                         ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        return None  # not PNG / truncated header -> let PIL report it
    if w.value * h.value > 1 << 30:
        return None  # absurd header dims (corrupt file): don't allocate
    out = np.empty((h.value, w.value, 3), dtype=np.uint8)
    rc = lib.gt_png_decode(buf.ctypes.data_as(ctypes.c_void_p),
                           ctypes.c_int64(len(data)),
                           out.ctypes.data_as(ctypes.c_void_p),
                           ctypes.c_int64(out.size))
    if rc != 0:
        return None  # unsupported subset -> PIL fallback
    return out, w.value, h.value


def read_png(data: bytes):
    """Decode PNG bytes -> (rgb uint8 [h, w, 3], width, height)."""
    res = _read_png_native(data)
    if res is not None:
        return res
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
