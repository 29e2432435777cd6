"""JPEG symbol histograms, entropy-size estimation, histogram clustering.

Reference: guetzli/jpeg_data_writer.cc:184-355. Histograms double-count
every symbol and keep a guard symbol (index 256) with count 1 so the
all-ones Huffman code is never assigned to a real symbol. The builders here
are numpy-vectorized over all blocks; the search loop calls the entropy-cost
estimators thousands of times, so they stay allocation-free.
"""

import numpy as np

from guetzli_tpu import consts
from guetzli_tpu.codec import huffman

K_SIZE = 257


def new_histogram() -> np.ndarray:
    h = np.zeros(K_SIZE, dtype=np.int64)
    h[K_SIZE - 1] = 1
    return h


def log2floor(v):
    """Exact integer floor(log2(v)); -1 for v == 0."""
    v = np.asarray(v, dtype=np.int64)
    bits = np.zeros(v.shape, dtype=np.int32)
    x = v.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = x >= (np.int64(1) << shift)
        bits[big] += shift
        x[big] >>= shift
    bits[v == 0] = -1
    return bits


def ac_symbols(coeffs):
    """Vectorized AC run-length symbol extraction for [N, 64] coefficients.

    Returns (symbols int32[M], f0_count int, eob_count int) where symbols
    are the (run<<4 | nbits) codes of each nonzero AC coefficient in zigzag
    order, f0_count the number of ZRL (0xf0) symbols and eob_count the
    number of end-of-block symbols. Mirrors UpdateACHistogramForDCTBlock
    (jpeg_data_writer.cc:188-209).
    """
    zig = coeffs[:, consts.JPEG_NATURAL_ORDER[1:64]]
    nb = zig.shape[0]
    rows, ks = np.nonzero(zig)           # row-major: ks ascending per row
    if rows.size == 0:
        return np.empty(0, np.int32), 0, nb
    vals = zig[rows, ks].astype(np.int64)
    first = np.empty(rows.size, dtype=bool)
    first[0] = True
    np.not_equal(rows[1:], rows[:-1], out=first[1:])
    # run of zeros before each nonzero: k - prev_k - 1 with k = ks+1 and
    # prev_k = 0 at the start of a row.
    run = ks - np.concatenate([[0], ks[:-1]]) - 1
    run[first] = ks[first]
    nbits = np.searchsorted(_POW2, np.abs(vals), side="right")
    symbols = (((run & 15) << 4) + nbits).astype(np.int32)
    f0_count = int((run >> 4).sum())
    last = np.empty(rows.size, dtype=bool)
    last[-1] = True
    np.not_equal(rows[1:], rows[:-1], out=last[:-1])
    eob_count = nb - int(np.count_nonzero(ks[last] == 62))
    return symbols, f0_count, eob_count


def build_ac_histogram(coeffs) -> np.ndarray:
    h = new_histogram()
    c = np.asarray(coeffs)
    if c.dtype == np.int16 and c.ndim == 2 and c.shape[1] == 64:
        from guetzli_tpu import native
        lib = native.get_lib()
        if lib is not None:
            import ctypes
            cc = np.ascontiguousarray(c)
            lib.gt_ac_histogram(
                cc.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
                ctypes.c_int64(cc.shape[0]),
                h.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
            return h
    symbols, f0, eob = ac_symbols(coeffs)
    h[:256] += 2 * np.bincount(symbols, minlength=256).astype(np.int64)
    h[0xf0] += 2 * f0
    h[0] += 2 * eob
    return h


def dc_scan_order(comp, mcu_rows, mcu_cols):
    """Block indices of one component in MCU scan order."""
    v, hsf = comp.v_samp_factor, comp.h_samp_factor
    my, mx = np.meshgrid(np.arange(mcu_rows), np.arange(mcu_cols),
                         indexing='ij')
    iy, ix = np.meshgrid(np.arange(v), np.arange(hsf), indexing='ij')
    by = my[:, :, None, None] * v + iy[None, None]
    bx = mx[:, :, None, None] * hsf + ix[None, None]
    return (by * comp.width_in_blocks + bx).reshape(-1)


def build_dc_histograms(jpg) -> list:
    """One histogram per component (jpeg_data_writer.cc:234-256)."""
    out = []
    for comp in jpg.components:
        order = dc_scan_order(comp, jpg.MCU_rows, jpg.MCU_cols)
        dcs = comp.coeffs[order, 0].astype(np.int64)
        diffs = np.abs(np.diff(np.concatenate([[0], dcs])))
        nbits = np.searchsorted(_POW2, diffs, side="right")
        h = new_histogram()
        h[:256] += 2 * np.bincount(nbits, minlength=256)[:256].astype(
            np.int64)
        out.append(h)
    return out


def build_ac_histograms(jpg) -> list:
    return [build_ac_histogram(comp.coeffs) for comp in jpg.components]


def histogram_header_cost(histo) -> int:
    """jpeg_data_writer.cc:211-219."""
    return 17 * 8 + 8 * int(np.count_nonzero(histo[:K_SIZE - 1]))


def histogram_entropy_cost(histo, depths) -> int:
    """jpeg_data_writer.cc:221-232."""
    counts = histo[:K_SIZE - 1].astype(np.int64)
    extra = np.arange(K_SIZE - 1, dtype=np.int64) & 0xf
    bits = int(np.sum((counts // 2) * (depths[:K_SIZE - 1] + extra)))
    bits += (bits * 3 + 512) >> 10
    return bits


def cluster_histograms(histos):
    """Merge-from-the-end clustering (jpeg_data_writer.cc:295-342).

    Returns (clustered, num, indexes, depths, total_cost_bytes) where
    ``depths`` is [len(histos), 257] uint8 of each original histogram's
    assigned code lengths.
    """
    histos = [h.copy() for h in histos]
    num = len(histos)
    depths = np.zeros((num, K_SIZE), dtype=np.uint8)
    indexes = list(range(num))
    costs = np.zeros(num, dtype=np.int64)
    for i in range(num):
        depths[i] = huffman.create_huffman_tree_cached(histos[i])
        costs[i] = (histogram_header_cost(histos[i])
                    + histogram_entropy_cost(histos[i], depths[i]))
    orig_num = num
    while num > 1:
        last, second = num - 1, num - 2
        combined = histos[second].copy()
        combined[:K_SIZE - 1] += histos[last][:K_SIZE - 1]
        combined[K_SIZE - 1] = 1
        d = huffman.create_huffman_tree_cached(combined)
        cost = (histogram_header_cost(combined)
                + histogram_entropy_cost(combined, d))
        if cost < costs[last] + costs[second]:
            histos[second] = combined
            histos[last] = new_histogram()
            costs[second] = cost
            depths[second] = d
            for i in range(orig_num):
                if indexes[i] == last:
                    indexes[i] = second
            num -= 1
        else:
            break
    total = int(costs[:num].sum())
    out_depths = depths[[indexes[i] for i in range(orig_num)]]
    return histos, num, indexes, out_depths, (total + 7) // 8


def compute_entropy_codes(histograms):
    """processor.cc:517-536: cluster + per-input depths + header size."""
    clustered, num, _indexes, out_depths, _total = \
        cluster_histograms(histograms)
    hdr = 0
    for i in range(num):
        hdr += histogram_header_cost(clustered[i]) // 8
    return out_depths, hdr


def entropy_coded_data_size(histograms, depths) -> int:
    """processor.cc:538-546."""
    numbits = 0
    for i, h in enumerate(histograms):
        numbits += histogram_entropy_cost(h, depths[i])
    return (numbits + 7) // 8


def estimate_dc_size(jpg) -> int:
    """processor.cc:548-555."""
    histos = build_dc_histograms(jpg)
    return cluster_histograms(histos)[4]


_NAT_AC = consts.JPEG_NATURAL_ORDER[1:64]
_POW2 = np.asarray([1 << i for i in range(16)], dtype=np.int64)


def update_ac_histogram(weight, coeffs64, quant, hist):
    """Incremental AC histogram update for one block (processor.cc:491-515).

    ``coeffs64`` holds dequantized values (exact multiples of ``quant``);
    symbols use coeff/quant. Lean 1-D fast path -- this runs twice per
    coefficient flip in the back-end loop's hot path.
    """
    zig = (coeffs64[_NAT_AC].astype(np.int64)
           // quant[_NAT_AC].astype(np.int64))
    nzpos = np.nonzero(zig)[0]
    w2 = 2 * weight
    if nzpos.size == 0:
        hist[0] += w2
        return
    runs = np.diff(nzpos, prepend=-1) - 1
    f0 = int((runs >> 4).sum())
    rr = runs & 15
    nbits = np.searchsorted(_POW2, np.abs(zig[nzpos]), side="right")
    np.add.at(hist, (rr << 4) + nbits, w2)
    if f0:
        hist[0xf0] += w2 * f0
    if nzpos[-1] < 62:
        hist[0] += w2
