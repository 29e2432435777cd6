"""guetzli-tpu: a TPU-native perceptual JPEG encoder.

Brand-new JAX/XLA/Pallas implementation with the capabilities of
yyamamoto79/guetzli-cuda-opencl (see SURVEY.md for the structural map and
COMPONENTS.md for the component-by-component correspondence).

Quick start:
    from guetzli_tpu import encode
    jpeg_bytes = encode(open("in.png", "rb").read(), quality=95)
"""

__version__ = "0.1.0"


def encode(data: bytes, quality: float = 95):
    """Encode PNG or JPEG bytes into a perceptually optimized JPEG."""
    from guetzli_tpu.parallel.api import encode_bytes
    return encode_bytes(data, quality)
