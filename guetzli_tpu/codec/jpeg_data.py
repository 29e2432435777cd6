"""JPEG in-memory model (reference: guetzli/jpeg_data.{h,cc}).

Coefficients are numpy int16 arrays of shape [num_blocks, 64] in block
row-major order; quant tables are int32[64] in natural (row-major) order.
"""

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np


K_DCT_BLOCK_SIZE = 64
K_MAX_COMPONENTS = 4
K_JPEG_HUFFMAN_MAX_BIT_LENGTH = 16
K_JPEG_HUFFMAN_ALPHABET_SIZE = 256
K_JPEG_DC_ALPHABET_SIZE = 12

# libjpeg default quantization matrices (jpeg_data.h:40-57), natural order.
DEFAULT_QUANT_MATRIX = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61,
     12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56,
     14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77,
     24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101,
     72, 92, 95, 98, 112, 100, 103, 99],
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int32)


@dataclass
class QuantTable:
    values: np.ndarray          # int32[64], natural order
    precision: int = 0
    index: int = 0
    is_last: bool = True


@dataclass
class HuffmanCode:
    """A DHT entry as parsed from an input JPEG."""
    counts: np.ndarray          # int32[17]
    values: np.ndarray          # int32[<=257]
    slot_id: int = 0
    is_last: bool = True


@dataclass
class ScanComponentInfo:
    comp_idx: int
    dc_tbl_idx: int
    ac_tbl_idx: int


@dataclass
class ScanInfo:
    Ss: int = 0
    Se: int = 63
    Ah: int = 0
    Al: int = 0
    components: List[ScanComponentInfo] = field(default_factory=list)


@dataclass
class Component:
    id: int = 0
    h_samp_factor: int = 1
    v_samp_factor: int = 1
    quant_idx: int = 0
    width_in_blocks: int = 0
    height_in_blocks: int = 0
    coeffs: Optional[np.ndarray] = None   # int16 [num_blocks, 64]

    @property
    def num_blocks(self) -> int:
        return self.width_in_blocks * self.height_in_blocks


@dataclass
class JpegData:
    width: int = 0
    height: int = 0
    max_h_samp_factor: int = 1
    max_v_samp_factor: int = 1
    MCU_rows: int = 0
    MCU_cols: int = 0
    restart_interval: int = 0
    app_data: List[bytes] = field(default_factory=list)
    com_data: List[bytes] = field(default_factory=list)
    quant: List[QuantTable] = field(default_factory=list)
    huffman_code: List[HuffmanCode] = field(default_factory=list)
    components: List[Component] = field(default_factory=list)
    scan_info: List[ScanInfo] = field(default_factory=list)
    marker_order: List[int] = field(default_factory=list)
    inter_marker_data: List[bytes] = field(default_factory=list)
    tail_data: bytes = b''

    def is_420(self) -> bool:
        c = self.components
        return (len(c) == 3 and self.max_h_samp_factor == 2
                and self.max_v_samp_factor == 2
                and c[0].h_samp_factor == 2 and c[0].v_samp_factor == 2
                and c[1].h_samp_factor == 1 and c[1].v_samp_factor == 1
                and c[2].h_samp_factor == 1 and c[2].v_samp_factor == 1)

    def is_444(self) -> bool:
        c = self.components
        return (len(c) == 3 and self.max_h_samp_factor == 1
                and self.max_v_samp_factor == 1
                and all(x.h_samp_factor == 1 and x.v_samp_factor == 1
                        for x in c))


def init_yuv444(w: int, h: int) -> JpegData:
    """jpeg_data.cc InitJPEGDataForYUV444."""
    jpg = JpegData(width=w, height=h, max_h_samp_factor=1,
                   max_v_samp_factor=1,
                   MCU_rows=(h + 7) >> 3, MCU_cols=(w + 7) >> 3)
    # Note: the reference leaves every table's DQT index at the ctor default
    # of 0 here (jpeg_data.h:85-95) — the initial stream carries three
    # tables all claiming index 0, and SOF points every component at 0.
    jpg.quant = [QuantTable(np.ones(64, dtype=np.int32), index=0)
                 for _ in range(3)]
    for i in range(3):
        c = Component(id=i, quant_idx=i,
                      width_in_blocks=jpg.MCU_cols,
                      height_in_blocks=jpg.MCU_rows)
        c.coeffs = np.zeros((c.num_blocks, 64), dtype=np.int16)
        jpg.components.append(c)
    return jpg


def save_quant_tables(q, jpg: JpegData) -> None:
    """Dedupe per-component quant tables into jpg.quant (jpeg_data.cc)."""
    q = np.asarray(q, dtype=np.int32).reshape(len(jpg.components), 64)
    jpg.quant = []
    for i, comp in enumerate(jpg.components):
        found = False
        for j, table in enumerate(jpg.quant):
            if np.array_equal(q[i], table.values):
                comp.quant_idx = j
                found = True
                break
        if not found:
            precision = 1 if int(q[i].max()) > 0xff else 0
            comp.quant_idx = len(jpg.quant)
            jpg.quant.append(QuantTable(q[i].copy(), precision=precision,
                                        index=len(jpg.quant)))
