"""JPEG bitstream serialization (reference: guetzli/jpeg_data_writer.cc).

Produces byte-identical output to the reference writer: optimal Huffman
codes from clustered histograms, DQT/SOF(C1)/DHT/SOS markers and a fully
vectorized entropy-coded scan (token tables -> flat bit array -> packbits ->
0xFF byte stuffing), replacing the reference's serial BitWriter.
"""

import numpy as np

from guetzli_tpu import consts
from guetzli_tpu.codec import histograms as hg
from guetzli_tpu.codec import huffman

_NAT = consts.JPEG_NATURAL_ORDER[:64]


def _encode_metadata(jpg, strip_metadata):
    if strip_metadata:
        return b'\xff' + bytes(jd_app0())
    out = bytearray()
    for app in jpg.app_data:
        out += b'\xff' + app
    for com in jpg.com_data:
        out += b'\xff\xfe' + com
    return bytes(out)


def jd_app0():
    from guetzli_tpu.codec.encoder import APP0_JFIF
    return APP0_JFIF


def _encode_dqt(quant_tables):
    marker_len = 2
    for t in quant_tables:
        marker_len += 1 + (2 if t.precision else 1) * 64
    out = bytearray([0xff, 0xdb, marker_len >> 8, marker_len & 0xff])
    for t in quant_tables:
        out.append((t.precision << 4) + t.index)
        vals = t.values[_NAT]
        for v in vals:
            v = int(v)
            if t.precision:
                out.append(v >> 8)
            out.append(v & 0xff)
    return bytes(out)


def _encode_sof(jpg):
    ncomps = len(jpg.components)
    marker_len = 8 + 3 * ncomps
    out = bytearray([0xff, 0xc1, marker_len >> 8, marker_len & 0xff, 8,
                     jpg.height >> 8, jpg.height & 0xff,
                     jpg.width >> 8, jpg.width & 0xff, ncomps])
    for c in jpg.components:
        out += bytes([c.id, (c.h_samp_factor << 4) | c.v_samp_factor,
                      jpg.quant[c.quant_idx].index])
    return bytes(out)


def _build_and_encode_huffman_codes(jpg, dc_histos=None, ac_histos=None):
    """DHT + SOS marker bytes plus per-component code tables
    (jpeg_data_writer.cc:361-453).

    dc_histos/ac_histos may be precomputed exact histograms of the current
    coefficients (e.g. the flip-maintained ones of the back-end loop);
    passing them skips the full coefficient pass and yields identical bytes.
    """
    ncomps = len(jpg.components)
    if dc_histos is None:
        dc_histos = hg.build_dc_histograms(jpg)
    _, num_dc, dc_idx, dc_depths, _ = hg.cluster_histograms(dc_histos)
    if ac_histos is None:
        ac_histos = hg.build_ac_histograms(jpg)
    ac_clustered, num_ac, ac_idx, ac_depths, _ = hg.cluster_histograms(
        ac_histos)
    dc_clustered, _, _, _, _ = hg.cluster_histograms(dc_histos)

    # Unique clustered histogram depths in emission order.
    entries = []          # (is_dc, idx, depths_of_cluster)
    seen_dc, seen_ac = set(), set()
    for i in range(ncomps):
        if dc_idx[i] not in seen_dc:
            seen_dc.add(dc_idx[i])
    for i in range(ncomps):
        if ac_idx[i] not in seen_ac:
            seen_ac.add(ac_idx[i])
    for idx in sorted(seen_dc):
        entries.append((True, idx))
    for idx in sorted(seen_ac):
        entries.append((False, idx))

    dc_tables = [None] * ncomps
    ac_tables = [None] * ncomps

    body = bytearray()
    total_count = 0
    parts = []
    for is_dc, idx in entries:
        depths = dc_depths[dc_idx.index(idx)] if is_dc else \
            ac_depths[ac_idx.index(idx)]
        counts, values = huffman.build_huffman_code(depths)
        depth_tab, code_tab = huffman.build_code_table(counts, values)
        for c in range(ncomps):
            if is_dc and dc_idx[c] == idx:
                dc_tables[c] = (depth_tab, code_tab)
            if not is_dc and ac_idx[c] == idx:
                ac_tables[c] = (depth_tab, code_tab)
        counts = counts.copy()
        max_length = 16
        while max_length > 0 and counts[max_length] == 0:
            max_length -= 1
        counts[max_length] -= 1
        tc = int(counts[:max_length + 1].sum())
        total_count += tc
        part = bytearray()
        part.append(idx if is_dc else idx + 0x10)
        part += bytes(int(counts[j]) for j in range(1, 17))
        part += bytes(int(values[j]) for j in range(tc))
        parts.append(part)

    num_histo = len(entries)
    dht_marker_len = 2 + num_histo * 17 + total_count
    out = bytearray([0xff, 0xc4, dht_marker_len >> 8, dht_marker_len & 0xff])
    for part in parts:
        out += part

    sos_marker_len = 6 + 2 * ncomps
    out += bytes([0xff, 0xda, sos_marker_len >> 8, sos_marker_len & 0xff,
                  ncomps])
    for i, c in enumerate(jpg.components):
        out += bytes([c.id, (dc_idx[i] << 4) | ac_idx[i]])
    out += bytes([0, 63, 0])
    return bytes(out), dc_tables, ac_tables


def _scan_tokens(jpg, dc_tables, ac_tables):
    """Token (nbits, value) arrays for the whole interleaved scan.

    Layout per block: slot 0-1 DC huffman+value, then 5 slots per AC
    position k=1..63 ([up to 3 ZRL] + huffman + value), then 1 EOB slot.
    Invalid slots have nbits 0 and are compacted away. Blocks are ordered
    (MCU, component, v, h) as the interleaved scan requires.
    """
    ncomp = len(jpg.components)
    per_comp = []
    for i, comp in enumerate(jpg.components):
        order = hg.dc_scan_order(comp, jpg.MCU_rows, jpg.MCU_cols)
        coeffs = comp.coeffs[order].astype(np.int32)   # [NB, 64] scan order
        nb = coeffs.shape[0]
        dc_depth, dc_code = dc_tables[i]
        ac_depth, ac_code = ac_tables[i]

        nslots = 2 + 63 * 5 + 1
        tok_bits = np.zeros((nb, nslots), dtype=np.int32)
        tok_vals = np.zeros((nb, nslots), dtype=np.int64)

        # DC: difference coding.
        dcs = coeffs[:, 0].astype(np.int64)
        diffs = dcs - np.concatenate([[0], dcs[:-1]])
        temp = np.abs(diffs)
        temp2 = np.where(diffs < 0, diffs - 1, diffs)
        nbits = hg.log2floor(temp) + 1
        tok_bits[:, 0] = dc_depth[nbits]
        tok_vals[:, 0] = dc_code[nbits]
        tok_bits[:, 1] = nbits
        tok_vals[:, 1] = temp2 & ((1 << np.maximum(nbits, 0)) - 1)
        tok_bits[:, 1] = np.where(nbits > 0, nbits, 0)

        # AC run-length coding.
        zig = coeffs[:, _NAT[1:64]].astype(np.int64)
        ks = np.arange(1, 64, dtype=np.int64)
        mask = zig != 0
        lastnz = np.maximum.accumulate(
            np.where(mask, ks[None, :], 0), axis=1)
        prev = np.concatenate(
            [np.zeros((nb, 1), dtype=np.int64), lastnz[:, :-1]], axis=1)
        run = np.where(mask, ks[None, :] - prev - 1, 0)
        nf0 = (run >> 4)
        rr = run - (nf0 << 4)
        absz = np.abs(zig)
        vnbits = hg.log2floor(absz) + 1
        symbol = (rr << 4) + vnbits
        temp2ac = np.where(zig < 0, ~absz, zig)

        ac = tok_bits[:, 2:2 + 63 * 5].reshape(nb, 63, 5)
        acv = tok_vals[:, 2:2 + 63 * 5].reshape(nb, 63, 5)
        for f in range(3):
            emit = mask & (nf0 > f)
            ac[:, :, f] = np.where(emit, ac_depth[0xf0], 0)
            acv[:, :, f] = np.where(emit, ac_code[0xf0], 0)
        ac[:, :, 3] = np.where(mask, ac_depth[symbol], 0)
        acv[:, :, 3] = np.where(mask, ac_code[symbol], 0)
        ac[:, :, 4] = np.where(mask, vnbits, 0)
        acv[:, :, 4] = np.where(
            mask, temp2ac & ((1 << np.maximum(vnbits, 1)) - 1), 0)
        tok_bits[:, 2:2 + 63 * 5] = ac.reshape(nb, 63 * 5)
        tok_vals[:, 2:2 + 63 * 5] = acv.reshape(nb, 63 * 5)

        eob = lastnz[:, -1] < 63
        tok_bits[:, -1] = np.where(eob, ac_depth[0], 0)
        tok_vals[:, -1] = np.where(eob, ac_code[0], 0)
        per_comp.append((tok_bits, tok_vals, nb))

    # Interleave per MCU: for 444 each MCU has one block per component; for
    # 420, Y contributes 4 blocks per MCU. dc_scan_order already linearizes
    # each component in MCU order, so interleaving is a block-count split.
    mcus = jpg.MCU_rows * jpg.MCU_cols
    rows = []
    for i, comp in enumerate(jpg.components):
        bits, vals, nb = per_comp[i]
        per_mcu = comp.h_samp_factor * comp.v_samp_factor
        rows.append((bits.reshape(mcus, per_mcu * bits.shape[1]),
                     vals.reshape(mcus, per_mcu * vals.shape[1])))
    tok_bits = np.concatenate([r[0] for r in rows], axis=1)
    tok_vals = np.concatenate([r[1] for r in rows], axis=1)
    return tok_bits.reshape(-1), tok_vals.reshape(-1)


def _pack_bits(tok_bits, tok_vals):
    """Concatenate variable-length big-endian tokens into stuffed bytes.

    Each token is at most 16 bits, so after aligning it into a 32-bit
    big-endian window starting at its byte offset it touches at most 4
    bytes; tokens never share bits, so per-byte contributions can be summed
    with bincount -- no bit-array materialization.
    """
    valid = tok_bits > 0
    nbits = tok_bits[valid].astype(np.int64)
    vals = tok_vals[valid].astype(np.int64)
    total = int(nbits.sum())
    # Pad to byte boundary with 1-bits (BitWriter::JumpToByteBoundary).
    pad = (-total) % 8
    if pad:
        nbits = np.concatenate([nbits, [pad]])
        vals = np.concatenate([vals, [(1 << pad) - 1]])
        total += pad
    ends = np.cumsum(nbits)
    starts = ends - nbits
    nbytes = total // 8
    byte_ix = starts >> 3
    bit_off = starts & 7
    window = (vals & ((1 << nbits) - 1)) << (32 - bit_off - nbits)
    out = np.zeros(nbytes, dtype=np.int64)
    for shift in (24, 16, 8, 0):
        contrib = (window >> shift) & 0xFF
        pos = byte_ix + (3 - shift // 8)
        sel = (contrib > 0) & (pos < nbytes)
        if sel.any():
            out += np.bincount(pos[sel], weights=contrib[sel],
                               minlength=nbytes).astype(np.int64)
    data = out.astype(np.uint8)
    # 0xFF byte stuffing.
    ff = np.nonzero(data == 0xff)[0]
    if len(ff):
        data = np.insert(data, ff + 1, 0)
    return data.tobytes()


def _encode_scan_native(jpg, dc_tables, ac_tables):
    """Serialize the scan via the C++ kernel; None if unavailable."""
    import ctypes

    from guetzli_tpu import native
    lib = native.get_lib()
    if lib is None:
        return None
    ncomp = len(jpg.components)
    coeff_arrays = []
    ptrs = (ctypes.POINTER(ctypes.c_int16) * ncomp)()
    wib = (ctypes.c_int * ncomp)()
    hib = (ctypes.c_int * ncomp)()
    hs = (ctypes.c_int * ncomp)()
    vs = (ctypes.c_int * ncomp)()
    dc_depth = np.zeros((ncomp, 257), dtype=np.uint8)
    dc_code = np.zeros((ncomp, 257), dtype=np.int32)
    ac_depth = np.zeros((ncomp, 257), dtype=np.uint8)
    ac_code = np.zeros((ncomp, 257), dtype=np.int32)
    total_blocks = 0
    for i, comp in enumerate(jpg.components):
        arr = np.ascontiguousarray(comp.coeffs, dtype=np.int16)
        coeff_arrays.append(arr)
        ptrs[i] = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))
        wib[i] = comp.width_in_blocks
        hib[i] = comp.height_in_blocks
        hs[i] = comp.h_samp_factor
        vs[i] = comp.v_samp_factor
        dc_depth[i], dc_code[i] = dc_tables[i]
        ac_depth[i], ac_code[i] = ac_tables[i]
        total_blocks += arr.shape[0]
    cap = total_blocks * 64 * 4 + 4096
    out = np.empty(cap, dtype=np.uint8)
    n = lib.gt_encode_scan(
        ptrs, wib, hib, hs, vs, ctypes.c_int(ncomp),
        ctypes.c_int(jpg.MCU_rows), ctypes.c_int(jpg.MCU_cols),
        dc_depth.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        dc_code.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ac_depth.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ac_code.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(cap))
    if n < 0:
        return None
    return out[:n].tobytes()


def write_jpeg(jpg, strip_metadata=True, dc_histograms=None,
               ac_histograms=None) -> bytes:
    """Serialize JpegData to bytes (jpeg_data_writer.cc:540-553)."""
    out = bytearray(b'\xff\xd8')
    out += _encode_metadata(jpg, strip_metadata)
    out += _encode_dqt(jpg.quant)
    out += _encode_sof(jpg)
    header, dc_tables, ac_tables = _build_and_encode_huffman_codes(
        jpg, dc_histograms, ac_histograms)
    out += header
    scan = _encode_scan_native(jpg, dc_tables, ac_tables)
    if scan is None:
        tok_bits, tok_vals = _scan_tokens(jpg, dc_tables, ac_tables)
        scan = _pack_bits(tok_bits, tok_vals)
    out += scan
    out += b'\xff\xd9'
    if not strip_metadata:
        out += jpg.tail_data
    return bytes(out)


def jpeg_header_size(jpg, strip_metadata=True) -> int:
    """jpeg_data_writer.cc:269-293."""
    n = 2
    if strip_metadata:
        n += 18
    else:
        n += sum(1 + len(a) for a in jpg.app_data)
        n += sum(2 + len(c) for c in jpg.com_data)
    n += 4
    for t in jpg.quant:
        n += 1 + (2 if t.precision else 1) * 64
    n += 10 + 3 * len(jpg.components)
    n += 4
    n += 8 + 2 * len(jpg.components)
    n += 2
    n += len(jpg.tail_data)
    return n
