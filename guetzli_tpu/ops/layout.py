"""TPU tiled-layout policy switch.

TPU HBM/VMEM tensors are tiled T(8, 128): the minor dim is padded to 128
lanes and the second-minor to 8 sublanes. A plane-scale tensor with a
narrow minor dim (e.g. the 8 of an ``[..., bw, 8]`` window split or the
``step`` of a nearest-upsample repeat) physically occupies up to 16-32x
its logical bytes -- the round-2 mpix1 quant-wave OOM
(f32[8,6,276,8,468,8] -> 25.6 GB). Ops with a layout choice consult
``lane_safe()``: True selects the formulation whose every plane-scale
intermediate keeps a wide minor dim.

CPU keeps the narrow-minor formulations (no tiling there, and the CPU
golden corpus pins their exact rounding); tests force the accelerator
formulation on CPU via GUETZLI_TPU_LANE_SAFE=1 to validate numerics and
to lower programs for tiled-footprint regression checks
(tests/test_wave_memory.py).
"""

import os

import jax


def lane_safe():
    from guetzli_tpu import config
    v = config.current().lane_safe
    if v is not None:
        return v
    return jax.default_backend() != "cpu"
