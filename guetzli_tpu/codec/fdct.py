"""Vectorized integer 8x8 forward DCT (reference: guetzli/fdct.cc).

Bit-exact fixed-point transform (output scaled by 16), operating on a batch
of blocks at once. Matches the reference's 32-bit wraparound arithmetic via
numpy int32. Used by the initial RGB->JPEG encode; runs on host once per
image, so numpy is the right tool (the per-candidate IDCT hot path lives in
guetzli_tpu.ops.dct as JAX).
"""

import numpy as np

# Cosine tables: C(k) = cos(k*pi/16)/sqrt(2) in 15-bit fixed point; the
# odd-row tables are pre-multiplied by 2*C(row) (fdct.cc:192-199).
_TABLE04 = np.array([22725, 21407, 19266, 16384, 12873, 8867, 4520],
                    dtype=np.int32)
_TABLE17 = np.array([31521, 29692, 26722, 22725, 17855, 12299, 6270],
                    dtype=np.int32)
_TABLE26 = np.array([29692, 27969, 25172, 21407, 16819, 11585, 5906],
                    dtype=np.int32)
_TABLE35 = np.array([26722, 25172, 22654, 19266, 15137, 10426, 5315],
                    dtype=np.int32)
_ROW_TABLES = [_TABLE04, _TABLE17, _TABLE26, _TABLE35, _TABLE04, _TABLE35,
               _TABLE26, _TABLE17]

_K_TAN1 = np.int32(13036)
_K_TAN2 = np.int32(27146)
_K_TAN3M1 = np.int32(-21746)
_K_2SQRT2 = np.int32(23170)


def _mult(a, b):
    return ((a.astype(np.int64) * b) >> 16).astype(np.int32)


def _column_dct(blocks):
    """In-place vertical pass over [N, 8(row), 8(col)] int32 blocks."""
    i = [blocks[:, r, :] for r in range(8)]
    m0, m7 = i[0] - i[7], i[0] + i[7]
    m2, m5 = i[2] - i[5], i[2] + i[5]
    m3, m4 = i[3] - i[4], i[3] + i[4]
    m1, m6 = i[1] - i[6], i[1] + i[6]
    m7, m4 = m7 - m4, m7 + m4
    m6, m5 = m6 - m5, m6 + m5

    m4 = m4 << 3
    m5 = m5 << 3
    m4, m5 = m4 - m5, m4 + m5
    blocks[:, 0, :] = m5
    blocks[:, 4, :] = m4

    m7 = m7 << 3
    m6 = m6 << 3
    m3 = m3 << 3
    m0 = m0 << 3

    t4 = _mult(m7, _K_TAN2)
    t5 = _mult(m6, _K_TAN2)
    blocks[:, 2, :] = t5 + m7
    blocks[:, 6, :] = t4 - m6

    m2 = m2 << 4
    m1 = m1 << 4
    m1, m2 = m1 - m2, m1 + m2
    m2 = _mult(m2, _K_2SQRT2)
    m1 = _mult(m1, _K_2SQRT2)
    m3, m1 = m3 - m1, m3 + m1
    m0, m2 = m0 - m2, m0 + m2

    m7s = m3
    m6s = m1
    m3 = _mult(m3, _K_TAN3M1) + m7s + 1
    m1 = _mult(m1, _K_TAN1) + m2 + 1
    t4 = _mult(m0, _K_TAN3M1) + m0
    t5 = _mult(m2, _K_TAN1)
    m0s = m0 - m3
    m7o = m7s + t4
    m5o = t5 - m6s

    blocks[:, 1, :] = m1
    blocks[:, 3, :] = m0s
    blocks[:, 5, :] = m7o
    blocks[:, 7, :] = m5o


def _row_dct(rows, table):
    """Horizontal pass over [N, 8] int32 rows with a given cosine table."""
    a0 = rows[:, 0] + rows[:, 7]
    b0 = rows[:, 0] - rows[:, 7]
    a1 = rows[:, 1] + rows[:, 6]
    b1 = rows[:, 1] - rows[:, 6]
    a2 = rows[:, 2] + rows[:, 5]
    b2 = rows[:, 2] - rows[:, 5]
    a3 = rows[:, 3] + rows[:, 4]
    b3 = rows[:, 3] - rows[:, 4]

    c0 = (a0 + a3).astype(np.int64)
    c1 = (a0 - a3).astype(np.int64)
    c2 = (a1 + a2).astype(np.int64)
    c3 = (a1 - a2).astype(np.int64)
    C1, C2, C3, C4, C5, C6, C7 = (int(table[k]) for k in range(7))
    b0 = b0.astype(np.int64)
    b1 = b1.astype(np.int64)
    b2 = b2.astype(np.int64)
    b3 = b3.astype(np.int64)

    out = np.empty_like(rows)
    # DESCALE is a plain >>16 on int32 (wraparound semantics preserved by
    # casting the products back to int32 before shifting).
    def desc(v):
        return (v.astype(np.int64).astype(np.int32) >> 16).astype(np.int32)
    out[:, 0] = desc(C4 * (c0 + c2))
    out[:, 4] = desc(C4 * (c0 - c2))
    out[:, 2] = desc(C2 * c1 + C6 * c3)
    out[:, 6] = desc(C6 * c1 - C2 * c3)
    out[:, 1] = desc(C1 * b0 + C3 * b1 + C5 * b2 + C7 * b3)
    out[:, 3] = desc(C3 * b0 - C7 * b1 - C1 * b2 - C5 * b3)
    out[:, 5] = desc(C5 * b0 - C1 * b1 + C7 * b2 + C3 * b3)
    out[:, 7] = desc(C7 * b0 - C5 * b1 + C3 * b2 - C1 * b3)
    return out


def compute_block_dct(blocks):
    """[N, 64] int -> [N, 64] int32 DCT coefficients scaled by 16."""
    b = np.ascontiguousarray(blocks.reshape(-1, 8, 8).astype(np.int32))
    _column_dct(b)
    for r in range(8):
        b[:, r, :] = _row_dct(b[:, r, :], _ROW_TABLES[r])
    return b.reshape(-1, 64)
