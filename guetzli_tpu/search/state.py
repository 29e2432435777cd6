"""Mutable encoder image state: dequantized DCT coefficients + quant.

TPU redesign of guetzli/output_image.{h,cc}: instead of an incrementally
maintained x16 pixel cache updated on every SetCoeffBlock (output_image.cc:
124-133), the state is just the coefficient tensor -- pixels are
rematerialized on device from all coefficients at once whenever the metric
needs them (one batched IDCT is cheap; the cache only pays off for serial
CPU mutation). For YUV444 every per-block evaluation is exactly
reproducible from coefficients alone.

Coefficients are kept *dequantized* (multiples of the quant values), same
as OutputImageComponent::coeffs_.
"""

from dataclasses import dataclass

import numpy as np

from guetzli_tpu.codec import jpeg_data as jd


def quantize(coeff, quant):
    """Round to nearest multiple (guetzli/quantize.h), C truncation."""
    c = np.asarray(coeff, dtype=np.int64)
    q = np.asarray(quant, dtype=np.int64)
    r = np.sign(c) * (np.abs(c) % q)
    delta = np.where(2 * r > q, q - r, np.where(-2 * r > q, -q - r, -r))
    return (c + delta).astype(np.int32)


@dataclass
class CoeffImage:
    """YUV444 image state: [3, NB, 64] dequantized coefficients."""
    width: int
    height: int
    bw: int                 # blocks per row
    bh: int                 # block rows
    coeffs: np.ndarray      # int32 [3, NB, 64]
    quant: np.ndarray       # int32 [3, 64]

    @classmethod
    def from_jpeg(cls, jpg: jd.JpegData) -> "CoeffImage":
        """OutputImage::CopyFromJpegData for a 444 jpg: dequantize."""
        assert jpg.is_444() or len(jpg.components) == 3
        bw, bh = jpg.MCU_cols, jpg.MCU_rows
        coeffs = np.stack([
            c.coeffs.astype(np.int32)
            * jpg.quant[c.quant_idx].values[None, :].astype(np.int32)
            for c in jpg.components])
        quant = np.stack([jpg.quant[c.quant_idx].values.astype(np.int32)
                          for c in jpg.components])
        return cls(jpg.width, jpg.height, bw, bh, coeffs, quant)

    def copy(self) -> "CoeffImage":
        return CoeffImage(self.width, self.height, self.bw, self.bh,
                          self.coeffs.copy(), self.quant.copy())

    def apply_global_quantization(self, q) -> None:
        """OutputImage::ApplyGlobalQuantization (output_image.cc:349-360)."""
        q = np.asarray(q, dtype=np.int32).reshape(3, 64)
        self.coeffs = quantize(self.coeffs, q[:, None, :])
        self.quant = q

    def is_component_all_zero(self, c) -> bool:
        return not np.any(self.coeffs[c])

    def save_to_jpeg_data(self, jpg_template: jd.JpegData) -> jd.JpegData:
        """OutputImage::SaveToJpegData (output_image.cc:579-640): divide by
        quant, grayscale collapse, fresh quant tables."""
        jpg = jd.JpegData(
            width=self.width, height=self.height,
            max_h_samp_factor=1, max_v_samp_factor=1,
            MCU_cols=self.bw, MCU_rows=self.bh,
            app_data=list(jpg_template.app_data),
            com_data=list(jpg_template.com_data),
            tail_data=jpg_template.tail_data)
        ncomp = 1 if (self.is_component_all_zero(1)
                      and self.is_component_all_zero(2)) else 3
        for c in range(ncomp):
            comp = jd.Component(
                id=c, h_samp_factor=1, v_samp_factor=1,
                width_in_blocks=self.bw, height_in_blocks=self.bh)
            qc = self.quant[c]
            assert not np.any(self.coeffs[c] % qc[None, :]), \
                "coefficients must be multiples of the quant matrix"
            comp.coeffs = (self.coeffs[c] // qc[None, :]).astype(np.int16)
            jpg.components.append(comp)
        jd.save_quant_tables(self.quant[:ncomp], jpg)
        return jpg

    def get_block(self, c, block_ix) -> np.ndarray:
        return self.coeffs[c, block_ix]

    def set_coeff(self, c, block_ix, k, value) -> None:
        self.coeffs[c, block_ix, k] = value


def remove_original_quantization(jpg: jd.JpegData):
    """processor.cc:94-107: fold quant into coefficients, reset to ones.

    Returns the original quant matrices [3, 64] int32.
    """
    q_in = np.zeros((3, 64), dtype=np.int32)
    for i, c in enumerate(jpg.components):
        q = jpg.quant[c.quant_idx].values.astype(np.int32)
        q_in[i] = q
        # Reference stores the product back into int16 coeff_t; inputs are
        # sanity-checked to |coeff*quant| <= 4096 so this never overflows.
        c.coeffs = (c.coeffs.astype(np.int32) * q[None, :]).astype(np.int16)
    ones = np.ones((len(jpg.components), 64), dtype=np.int32)
    jd.save_quant_tables(ones, jpg)
    return q_in
