"""Native host-kernel loader.

Compiles src/native.cc once with g++ into a cached shared library and binds
it via ctypes (pybind11 is unavailable; the C ABI keeps the boundary
simple). All callers fall back to the pure-Python implementations when the
toolchain is missing, so the package works without a compiler.
"""

import ctypes
import os
import pathlib
import subprocess

_DIR = pathlib.Path(__file__).parent
_SRCS = [_DIR / "src" / "native.cc", _DIR / "src" / "png_decode.cc"]
_LIB = _DIR / "_cache" / "libguetzli_native.so"

_lib = None
_tried = False


def _build():
    _LIB.parent.mkdir(exist_ok=True)
    stamp = _LIB.with_suffix(".stamp")
    src_mtime = ",".join(str(s.stat().st_mtime_ns) for s in _SRCS)
    if _LIB.exists() and stamp.exists() and stamp.read_text() == src_mtime:
        return True
    cmd = (["g++", "-O3", "-march=native", "-shared", "-fPIC",
            "-o", str(_LIB)] + [str(s) for s in _SRCS] + ["-lz"])
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        return False
    stamp.write_text(src_mtime)
    return True


def get_lib():
    """The ctypes library handle, or None if unavailable."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    from guetzli_tpu import config
    if not config.current().native:
        return None
    if not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        return None
    lib.gt_encode_scan.restype = ctypes.c_int64
    lib.gt_decode_scan.restype = ctypes.c_int64
    lib.gt_backend_flips.restype = ctypes.c_int64
    lib.gt_png_dims.restype = ctypes.c_int64
    lib.gt_png_decode.restype = ctypes.c_int64
    lib.gt_quantize_blocks.restype = ctypes.c_int64
    lib.gt_ac_histogram.restype = ctypes.c_int64
    _lib = lib
    return _lib
