"""Shape buckets: one compiled program per size *bucket*, not per size.

The reference compiles its OpenCL/CUDA kernel program once in seconds
(clguetzli/ocl.cpp:26-43) because its kernels take xsize/ysize as plain
arguments. Under XLA every image geometry is a fresh program, and on the
tunneled-TPU deployment a fresh compile of the fused diffmap program costs
minutes — unusable for arbitrary inputs.

The fix is TPU-native: round every image up to a padded bucket (Wp, Hp),
make the *actual* size (w, h) a traced scalar operand, and compute every
position/validity mask in-graph from it. The only size-dependent values
that cannot be recomputed in-graph at full precision are the blur border
weights (float64 host accumulation, butteraugli.cc:76-89) — those are
shipped as small per-image operand arrays (`PadGeom.scales`). Result: the
program shape depends only on the bucket, so one warm compile cache entry
serves every image in the bucket, with identical metric values at every
valid pixel.
"""

from functools import lru_cache

import numpy as np

from guetzli_tpu import consts
from guetzli_tpu.ops.blur import border_scales


def bucket_dim(n: int) -> int:
    """Round a dimension up to its bucket: multiples of 32 up to 512,
    of 64 up to 1024, of 128 beyond — bounded compile count, <=2x (tiny
    images) and typically <=10% padded-pixel overhead."""
    n = max(n, 32)
    if n <= 512:
        q = 32
    elif n <= 1024:
        q = 64
    else:
        q = 128
    return -(-n // q) * q


# (name, sigma, shrink, border_ratio): every blur the diffmap pipeline
# runs.  `shrink` is how much smaller than (w, h) the blurred extent is
# (the diffmap's clustered blur runs on the inner (w-5, h-5) region,
# butteraugli.cc:1028-1037).
_SCALE_SPECS = (
    ("opsin", consts.OPSIN_SIGMA, 0, 0.0),
    ("ed0", consts.EDGE_DETECTOR_SIGMAS[0], 0, 0.0),
    ("ed1", consts.EDGE_DETECTOR_SIGMAS[1], 0, 0.0),
    ("ed2", consts.EDGE_DETECTOR_SIGMAS[2], 0, 0.0),
    ("edlf", consts.EDGE_LF_SIGMA, 0, 0.0),
    ("mask0", consts.MASK_SIGMAS[0], 0, 0.0),
    ("mask1", consts.MASK_SIGMAS[1], 0, 0.0),
    ("mask2", consts.MASK_SIGMAS[2], 0, 0.0),
    ("diffmap", consts.DIFFMAP_SIGMA, 5, consts.DIFFMAP_BORDER_RATIO),
)


@lru_cache(maxsize=64)
def _scales_np(w: int, h: int, wp: int, hp: int):
    out = {}
    for name, sigma, shrink, br in _SCALE_SPECS:
        out[name] = (border_scales(w - shrink, wp, sigma, br),
                     border_scales(h - shrink, hp, sigma, br))
    return out


class PadGeom:
    """Per-image padded-geometry state: bucket dims + operand arrays."""

    def __init__(self, w: int, h: int, wp: int = None, hp: int = None):
        self.w = int(w)
        self.h = int(h)
        self.wp = int(wp) if wp else bucket_dim(w)
        self.hp = int(hp) if hp else bucket_dim(h)
        assert self.wp % 16 == 0 and self.hp % 16 == 0
        assert self.wp >= w and self.hp >= h
        self.bw = -(-w // 8)          # real block grid
        self.bh = -(-h // 8)
        self.bwp = self.wp // 8       # padded block grid
        self.bhp = self.hp // 8

    def scales(self):
        """{name: (scale_x, scale_y)} numpy operand arrays (tiny)."""
        return _scales_np(self.w, self.h, self.wp, self.hp)

    # -- host-side padding helpers ------------------------------------

    def pad_plane(self, a, fill=0):
        """[..., h, w] -> [..., hp, wp]."""
        a = np.asarray(a)
        pads = [(0, 0)] * (a.ndim - 2) + [(0, self.hp - a.shape[-2]),
                                          (0, self.wp - a.shape[-1])]
        return np.pad(a, pads, constant_values=fill)

    def pad_blocks(self, coeffs, bw=None, bh=None, bwp=None, bhp=None):
        """Row-major block array [..., bh*bw, K] -> [..., bhp*bwp, K] with
        the real blocks scattered into the top-left of the padded grid."""
        bw = bw or self.bw
        bh = bh or self.bh
        bwp = bwp or self.bwp
        bhp = bhp or self.bhp
        c = np.asarray(coeffs)
        lead = c.shape[:-2]
        k = c.shape[-1]
        out = np.zeros(lead + (bhp * bwp, k), dtype=c.dtype)
        og = out.reshape(lead + (bhp, bwp, k))
        og[..., :bh, :bw, :] = c.reshape(lead + (bh, bw, k))
        return out

    def unpad_blocks(self, a, bw=None, bh=None, bwp=None, bhp=None):
        """Inverse of pad_blocks on the leading block axis: [bhp*bwp, ...]
        -> [bh*bw, ...]."""
        bw = bw or self.bw
        bh = bh or self.bh
        bwp = bwp or self.bwp
        bhp = bhp or self.bhp
        a = np.asarray(a)
        g = a.reshape((bhp, bwp) + a.shape[1:])
        return g[:bh, :bw].reshape((bh * bw,) + a.shape[1:])

    def unpad_grid(self, a, gbw, gbh, gbwp, gbhp):
        """[..., gbhp*gbwp] -> [..., gbh*gbw] (e.g. the [4, NB] weight
        rows for a factor grid)."""
        a = np.asarray(a)
        g = a.reshape(a.shape[:-1] + (gbhp, gbwp))
        return np.ascontiguousarray(g[..., :gbh, :gbw]).reshape(
            a.shape[:-1] + (gbh * gbw,))
