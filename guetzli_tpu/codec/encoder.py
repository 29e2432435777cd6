"""Initial RGB -> JPEG encode (reference: guetzli/jpeg_data_encoder.cc).

Converts RGB to YCbCr in 16-bit fixed point, runs the integer forward DCT
per 8x8 block, and quantizes (with the reference's reciprocal-multiply
rounding). With the default all-ones quant matrix this is the near-lossless
starting point of the search.
"""

import numpy as np

from guetzli_tpu.codec import jpeg_data as jd
from guetzli_tpu.codec.fdct import compute_block_dct

_K_IQUANT_BITS = 16
_K_DCT_BITS = _K_IQUANT_BITS + 4
_K_BIAS = 0x80 << (_K_DCT_BITS - 8)

APP0_JFIF = bytes([
    0xe0, 0x00, 0x10,
    0x4a, 0x46, 0x49, 0x46, 0x00,
    0x01, 0x01,
    0x00, 0x00, 0x01, 0x00, 0x01,
    0x00, 0x00,
])


def rgb_to_yuv16(rgb):
    """[..., 3] uint8 -> [..., 3] int16 YCbCr in [-128, 127]."""
    r = rgb[..., 0].astype(np.int32)
    g = rgb[..., 1].astype(np.int32)
    b = rgb[..., 2].astype(np.int32)
    half = 1 << 15
    out = np.empty(rgb.shape, dtype=np.int16)
    out[..., 0] = (19595 * r + 38469 * g + 7471 * b
                   - (128 << 16) + half) >> 16
    out[..., 1] = (-11059 * r - 21709 * g + 32768 * b + half - 1) >> 16
    out[..., 2] = (32768 * r - 27439 * g - 5329 * b + half - 1) >> 16
    return out


def encode_rgb_to_jpeg(rgb, w, h, quant=None) -> jd.JpegData:
    """rgb: uint8 [h, w, 3] (or flat [h*w*3])."""
    rgb = np.asarray(rgb, dtype=np.uint8).reshape(h, w, 3)
    jpg = jd.init_yuv444(w, h)
    jpg.app_data.append(APP0_JFIF)

    if quant is None:
        quant = np.ones((3, 64), dtype=np.int32)
    quant = np.asarray(quant, dtype=np.int32).reshape(3, 64)
    iquant = (((1 << _K_IQUANT_BITS) + 1) // quant).astype(np.int64)
    for i in range(3):
        jpg.quant[i].values = quant[i].copy()
        jpg.quant[i].precision = 1 if int(quant[i].max()) > 0xFF else 0

    # Pad to block grid by edge replication (the reference clamps x/y).
    bw, bh = jpg.MCU_cols, jpg.MCU_rows
    padded = np.pad(rgb, ((0, bh * 8 - h), (0, bw * 8 - w), (0, 0)),
                    mode='edge')
    yuv = rgb_to_yuv16(padded)          # [H, W, 3]
    # -> [3, nblocks, 64]
    blocks = (yuv.reshape(bh, 8, bw, 8, 3)
              .transpose(4, 0, 2, 1, 3)
              .reshape(3, bh * bw, 64))
    for c in range(3):
        # The reference stores DCT output in coeff_t (int16) before the
        # reciprocal-multiply quantization.
        coeffs = compute_block_dct(blocks[c]).astype(np.int16)
        q = (coeffs.astype(np.int64) * iquant[c][None, :] + _K_BIAS) \
            >> _K_DCT_BITS
        jpg.components[c].coeffs = q.astype(np.int16)
    return jpg
