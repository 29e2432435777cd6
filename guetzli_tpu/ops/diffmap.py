"""Full butteraugli diffmap in JAX (butteraugli.cc:985-1567).

Pipeline, mirroring ButteraugliComparator::DiffmapOpsinDynamicsImage:

  MaskHighIntensityChange -> EdgeDetectorMap -> BlockDiffMap ->
  EdgeDetectorLowFreq -> Mask -> CombineChannels -> CalculateDiffmap

Everything operates on whole planar images with static shapes, so a single
jit covers the entire metric; the per-step-grid loops of the reference
become strided slices and batched 8x8 block ops.
"""


import jax
import jax.numpy as jnp
import numpy as np

from guetzli_tpu import consts
from guetzli_tpu.ops import blockdiff as bd
from guetzli_tpu.ops.blur import blur, blur_planes


def mask_high_intensity_change(xyb0, xyb1):
    """butteraugli.cc:791-843. Inputs/outputs [3, H, W]."""
    ave = (xyb0 + xyb1) * 0.5
    y = ave[1]
    h, w = y.shape
    big = jnp.float32(-1.0)

    def sq_shift(dy, dx):
        shifted = jnp.roll(jnp.roll(y, -dy, axis=0), -dx, axis=1)
        d = shifted - y
        d = d * d
        valid = jnp.ones((h, w), dtype=bool)
        if dx == -1:
            valid = valid.at[:, 0].set(False)
        if dx == 1:
            valid = valid.at[:, -1].set(False)
        if dy == -1:
            valid = valid.at[0, :].set(False)
        if dy == 1:
            valid = valid.at[-1, :].set(False)
        return jnp.where(valid, d, big)

    sqr_max = jnp.maximum(
        jnp.maximum(sq_shift(0, -1), sq_shift(0, 1)),
        jnp.maximum(sq_shift(-1, 0), sq_shift(1, 0)))

    red = consts.MHIC_REDUCTION.astype(np.float32)
    chroma = np.float32(consts.MHIC_CHROMA_BALANCE)
    chroma_scale = chroma / (y + chroma)
    mix = jnp.stack([
        chroma_scale * np.float32(red[0]) / (sqr_max + np.float32(red[0])),
        np.float32(red[1]) / (sqr_max + np.float32(red[1])),
        chroma_scale * np.float32(red[2]) / (sqr_max + np.float32(red[2])),
    ])
    out0 = mix * xyb0 + (1.0 - mix) * ave
    out1 = mix * xyb1 + (1.0 - mix) * ave
    return out0, out1


def _pad_to_res(m, w, h, step):
    """Zero-pad a step-grid map [ny, nx, ...] to the full res grid
    [ceil(h/step), ceil(w/step), ...] (the reference stores every map in a
    res_xsize * res_ysize flat array; trailing entries stay zero)."""
    ry = -(-h // step)
    rx = -(-w // step)
    pads = [(0, ry - m.shape[0]), (0, rx - m.shape[1])]
    pads += [(0, 0)] * (m.ndim - 2)
    return jnp.pad(m, pads)


def _res_positions(size, step, margin):
    """Step-grid positions res (0, step, ...) with res + margin < size."""
    n = (size - margin - 1) // step + 1 if size > margin else 0
    return np.arange(n, dtype=np.int32) * step


def edge_detector_map(xyb0, xyb1, step=3):
    """butteraugli.cc:689-738, 1119-1149 -> [ny, nx, 3] on the step grid."""
    _, h, w = xyb0.shape
    # One batched conv per sigma over (image0, image1) channel pairs.
    pairs = [blur(jnp.stack([xyb0[c], xyb1[c]]), s, 0.0)
             for c, s in enumerate(consts.EDGE_DETECTOR_SIGMAS)]
    blurred0 = jnp.stack([p[0] for p in pairs])
    blurred1 = jnp.stack([p[1] for p in pairs])

    wgt = np.float32(consts.EDGE_DETECTOR_W)

    # Per-pixel horizontal / vertical 3-step central differences of both
    # images, mapped through the low-freq distance; plus validity masks.
    def dir_diff(b, axis):
        fwd = jnp.roll(b, -3, axis=axis)
        back = jnp.roll(b, 3, axis=axis)
        return wgt * (back - fwd)          # w * (b[p-3] - b[p+3])

    dh0 = dir_diff(blurred0, 2)
    dh1 = dir_diff(blurred1, 2)
    dv0 = dir_diff(blurred0, 1)
    dv1 = dir_diff(blurred1, 1)

    def lf_sq(d0, d1):
        vx0, vy0, vz0 = bd.xyb_low_freq_to_vals(d0[0], d0[1], d0[2])
        vx1, vy1, vz1 = bd.xyb_low_freq_to_vals(d1[0], d1[1], d1[2])
        return jnp.stack([(vx0 - vx1) ** 2, (vy0 - vy1) ** 2,
                          (vz0 - vz1) ** 2])   # [3, H, W]

    hmap = lf_sq(dh0, dh1)
    vmap = lf_sq(dv0, dv1)

    xs = jnp.arange(w)
    ys = jnp.arange(h)
    h_valid = ((xs >= 3) & (xs + 3 < w))[None, :] & jnp.ones(
        (h, 1), dtype=bool)
    v_valid = ((ys >= 3) & (ys + 3 < h))[:, None] & jnp.ones(
        (1, w), dtype=bool)

    rx = _res_positions(w, step, 8 - step)
    ry = _res_positions(h, step, 8 - step)
    px = np.minimum(rx, w - 8)
    py = np.minimum(ry, h - 8)

    acc = jnp.zeros((3, len(py), len(px)))
    cnt = jnp.zeros((len(py), len(px)))
    for oy, ox in ((0, 0), (7, 0), (0, 7), (7, 7)):
        gy = py + oy
        gx = px + ox
        hm = hmap[:, gy][:, :, gx]
        vm = vmap[:, gy][:, :, gx]
        hv = h_valid[gy][:, gx]
        vv = v_valid[gy][:, gx]
        acc = acc + jnp.where(hv, hm, 0.0) + jnp.where(vv, vm, 0.0)
        cnt = cnt + hv.astype(acc.dtype) + vv.astype(acc.dtype)

    mul = np.float32(consts.EDGE_DETECTOR_WEIGHT) * 8.0 / cnt
    out = jnp.moveaxis(acc * mul[None], 0, -1)     # [ny, nx, 3]
    return _pad_to_res(out, w, h, step)


def block_diff_map(xyb0, xyb1, step=3):
    """butteraugli.cc:1081-1117 -> (dc, ac) maps [ny, nx, 3]."""
    _, h, w = xyb0.shape
    rx = _res_positions(w, step, 8 - step - 1)
    ry = _res_positions(h, step, 8 - step - 1)
    px = np.minimum(rx, w - 8)
    py = np.minimum(ry, h - 8)

    ny, nx = len(py), len(px)
    yy0 = (py[:, None] + np.arange(8, dtype=np.int32)[None, :]).ravel()
    xx0 = (px[:, None] + np.arange(8, dtype=np.int32)[None, :]).ravel()

    def windows(img):
        # [3, H, W] -> [ny, nx, 3, 8, 8]. Two 1-D row/column gathers
        # instead of one 2-D [ny, nx, 8, 8] index grid: identical values
        # (pure reindexing), but the combined gather was 77% of the
        # whole-image compare at 8 MPix (tpu_r05_cmpprof_8m.json) while
        # axis-wise takes lower to cheap slices.
        rows = img[:, yy0, :]                      # [3, ny*8, W]
        wins = rows[:, :, xx0]                     # [3, ny*8, nx*8]
        wins = wins.reshape(3, ny, 8, nx, 8)
        return jnp.transpose(wins, (1, 3, 0, 2, 4))

    w0 = windows(xyb0).reshape(len(py), len(px), 3, 64)
    w1 = windows(xyb1).reshape(len(py), len(px), 3, 64)
    dc, ac, _edge = bd.block_diff(w0, w1)
    return _pad_to_res(dc, w, h, step), _pad_to_res(ac, w, h, step)


def edge_detector_low_freq(xyb0, xyb1, ac_map, step=3):
    """butteraugli.cc:1151-1205; adds into ac_map at x-offset 8//step."""
    _, h, w = xyb0.shape
    both = blur(jnp.stack([xyb0, xyb1]), consts.EDGE_LF_SIGMA, 0.0)
    e = both[1] - both[0]      # [3, H, W]

    ys = _res_positions(h, step, 8)  # loop condition: y + 8 < h
    xs = _res_positions(w, step, 8)
    if len(ys) == 0 or len(xs) == 0:
        return ac_map

    def shifted(dy, dx):
        return e[:, ys[:, None] + dy, xs[None, :] + dx]

    base = shifted(0, 0)
    diffs = [
        base - shifted(0, 8),
        base - shifted(8, 0),
        base - shifted(6, 6),
    ]
    # Direction 3 reaches x-6; zero when x < 8 (x==0..5 impossible on the
    # step grid except x==0,3,6; the guard in the reference is x < step=8).
    dx4 = jnp.where(jnp.asarray(xs < 8)[None, None, :],
                    jnp.zeros_like(base),
                    base - e[:, ys[:, None] + 6,
                             np.maximum(xs - 6, 0)[None, :]])
    diffs.append(dx4)

    per_k = []
    for d in diffs:
        sx, sy, sz = bd.xyb_diff_low_freq_squared(d[0], d[1], d[2])
        per_k.append(jnp.stack([sx, sy, sz]))     # [3, ny, nx]
    md = jnp.maximum(jnp.maximum(per_k[0], per_k[1]),
                     jnp.maximum(per_k[2], per_k[3]))
    add = jnp.moveaxis(md, 0, -1) * np.float32(consts.EDGE_LF_MUL)

    off = 8 // step
    pad_y = ac_map.shape[0] - add.shape[0]
    pad_x = ac_map.shape[1] - add.shape[1] - off
    add_full = jnp.pad(add, ((0, pad_y), (off, pad_x), (0, 0)))
    return ac_map + add_full


def diff_precompute(xyb0, xyb1):
    """butteraugli.cc:1440-1493 -> [3, H, W]."""
    def vals(d):
        # d: [3, H, W] neighbor difference
        vx = bd.color_diff_dx_hf(d[0] * np.float32(consts.XYB_HF_XMUL))
        vy = bd.color_diff_dy_hf(d[1] * np.float32(consts.XYB_HF_YMUL))
        vz = d[2] * np.float32(consts.XYB_HF_ZMUL)
        return jnp.stack([vx, vy, vz])

    def sup(img):
        # horizontal: ix2 = x+1, or x-1 at the right border
        right = jnp.concatenate(
            [img[:, :, 1:], img[:, :, -2:-1]], axis=2)
        down = jnp.concatenate(
            [img[:, 1:, :], img[:, -2:-1, :]], axis=1)
        vh = vals(img - right)
        vv = vals(img - down)
        return jnp.abs(vh) + jnp.abs(vv)

    return jnp.minimum(sup(xyb0), sup(xyb1))


def average5x5(img):
    """3x3 cross+diagonal average (butteraugli.cc:1379-1438), zero-padded.

    Nine shifted adds on the VPU; a [1,1,H,W] single-channel conv is a
    degenerate (and measurably slower) MXU shape."""
    h, w = img.shape[-2:]
    if h < 4 or w < 4:
        return img
    wgt = np.float32(consts.AVERAGE5X5_DIAG_W)
    scale = np.float32(1.0 / (5.0 + 4 * wgt))
    pads = [(0, 0)] * (img.ndim - 2) + [(1, 1), (1, 1)]
    p = jnp.pad(img, pads)
    c = p[..., :-2, 1:-1] + p[..., 2:, 1:-1] + p[..., 1:-1, :-2] \
        + p[..., 1:-1, 2:] + p[..., 1:-1, 1:-1]
    dg = p[..., :-2, :-2] + p[..., :-2, 2:] + p[..., 2:, :-2] \
        + p[..., 2:, 2:]
    return (c + wgt * dg) * scale


def min_square_val(img, square=4, offset=0):
    """Sliding-window min (butteraugli.cc:1332-1376)."""
    pads = [(0, 0)] * (img.ndim - 2) + [(offset, square - offset - 1)] * 2
    return jax.lax.reduce_window(
        img, jnp.inf, jax.lax.min,
        window_dimensions=(1,) * (img.ndim - 2) + (square, square),
        window_strides=(1,) * img.ndim,
        padding=pads)


def mask(xyb0, xyb1):
    """butteraugli.cc:1495-1567 -> (mask, mask_dc) each [3, H, W]."""
    m = diff_precompute(xyb0, xyb1)
    chans = []
    for c in range(3):
        mc = average5x5(m[c])
        mc = min_square_val(mc, 4, 0)
        mc = blur(mc, consts.MASK_SIGMAS[c], 0.0)
        chans.append(mc)
    s = jnp.stack(chans)
    p = s * consts.MASK_W.astype(np.float32)[:, None, None]

    g2 = np.float32(consts.K_GLOBAL_SCALE * consts.K_GLOBAL_SCALE)
    mask_out = jnp.stack([
        bd.mask_lut('x', p[0]),
        bd.mask_lut('y', p[1]),
        bd.mask_lut('b', p[2]),
    ]) * g2
    mask_dc = jnp.stack([
        bd.mask_lut('dc_x', p[0]),
        bd.mask_lut('dc_y', p[1]),
        bd.mask_lut('dc_b', p[2]),
    ]) * g2
    return mask_out, mask_dc


def combine_channels(mask_xyb, mask_dc, dc_map, ac_map, edge_map, h, w,
                     step=3):
    """butteraugli.cc:1207-1231 -> res-grid diffmap [ny, nx]."""
    ry = _res_positions(h, step, 8 - step)
    rx = _res_positions(w, step, 8 - step)
    msel = mask_xyb[:, ry[:, None] + 3, rx[None, :] + 3]
    dsel = mask_dc[:, ry[:, None] + 3, rx[None, :] + 3]
    ny, nx = len(ry), len(rx)
    dc = dc_map[:ny, :nx]
    ac = ac_map[:ny, :nx]
    em = edge_map[:ny, :nx]
    hi = jax.lax.Precision.HIGHEST
    res = (jnp.einsum('yxc,cyx->yx', dc, dsel, precision=hi)
           + jnp.einsum('yxc,cyx->yx', ac, msel, precision=hi)
           + jnp.einsum('yxc,cyx->yx', em, msel, precision=hi))
    return res


def calculate_diffmap(res_map, h, w, step=3):
    """Upsample-sqrt + clustered blur (butteraugli.cc:985-1044) -> [H, W]."""
    s2 = (8 - step) // 2
    slope = np.float32(consts.DIFFMAP_INITIAL_SLOPE)
    val = jnp.where(res_map < 1.0 / (slope * slope),
                    slope * res_map, jnp.sqrt(res_map))
    up = jnp.repeat(jnp.repeat(val, step, axis=0), step, axis=1)
    ny, nx = res_map.shape
    dm = jnp.zeros((h, w), dtype=res_map.dtype)
    dm = dm.at[s2:s2 + ny * step, s2:s2 + nx * step].set(
        up[:min(ny * step, h - s2), :min(nx * step, w - s2)])

    s = 8 - step
    inner = dm[s2:s2 + h - s, s2:s2 + w - s]
    blurred = blur(inner, consts.DIFFMAP_SIGMA, consts.DIFFMAP_BORDER_RATIO)
    dm = dm.at[s2:s2 + h - s, s2:s2 + w - s].add(
        np.float32(consts.DIFFMAP_MUL1) * blurred)
    return dm * np.float32(1.0 / (1.0 + consts.DIFFMAP_MUL1))


def diffmap_opsin_dynamics(xyb0, xyb1, step=3):
    """Full metric: opsin images in, per-pixel diffmap [H, W] out."""
    _, h, w = xyb0.shape
    if h < 8 or w < 8:
        return jnp.zeros((h, w), dtype=xyb0.dtype)
    xyb0m, xyb1m = mask_high_intensity_change(xyb0, xyb1)
    edge_map = edge_detector_map(xyb0m, xyb1m, step)
    dc_map, ac_map = block_diff_map(xyb0m, xyb1m, step)
    ac_map = edge_detector_low_freq(xyb0m, xyb1m, ac_map, step)
    mask_xyb, mask_dc = mask(xyb0m, xyb1m)
    res = combine_channels(mask_xyb, mask_dc, dc_map, ac_map, edge_map,
                           h, w, step)
    return calculate_diffmap(res, h, w, step)


def score_from_diffmap(dm):
    """butteraugli.cc:1233-1239."""
    return jnp.max(dm)


# ---------------------------------------------------------------------------
# Padded ("dynamic geometry") variants: identical math with the true image
# size (w, h) as traced int32 scalars and every array shape fixed by the
# padded bucket (Hp, Wp), so one compiled program serves every image in a
# bucket (ops/padgeom.py). Positions/validity masks are computed in-graph;
# the float64-precise blur border scales arrive as operand arrays `sc`.
# Inputs may hold garbage outside the valid region; every consumer masks.

from guetzli_tpu.ops.blur import blur_dyn  # noqa: E402


def _vmask(hp, wp, w, h):
    row = jnp.arange(hp, dtype=jnp.int32)[:, None]
    col = jnp.arange(wp, dtype=jnp.int32)[None, :]
    return (row < h) & (col < w)


def _pad_to_res_cm(m, w, h, step):
    """Channel-major _pad_to_res: [..., ny, nx] -> [..., RY, RX]."""
    ry = -(-h // step)
    rx = -(-w // step)
    pads = [(0, 0)] * (m.ndim - 2)
    pads += [(0, ry - m.shape[-2]), (0, rx - m.shape[-1])]
    return jnp.pad(m, pads)


def _res_positions_dyn(padded, actual, step, margin):
    """Static-count step-grid positions + dynamic validity (the padded
    analog of _res_positions)."""
    n = (padded - margin - 1) // step + 1
    pos = jnp.arange(n, dtype=jnp.int32) * step
    return pos, pos + margin < actual


def _sel_matrix(targets, size):
    """One-hot selection matrix [len(targets), size] from (traced) int32
    positions: row i is 1.0 at column targets[i]."""
    return (targets[:, None]
            == jnp.arange(size, dtype=jnp.int32)[None, :]).astype(
                jnp.float32)


def _select_yx(img, ty, tx):
    """img [C, H, W] -> [C, len(ty), len(tx)] picking rows ty and columns
    tx. Exact either way (each output element is a copy of one input
    element); two formulations:

      * axis-wise `take`s (default): whole-row/column slice gathers,
        which XLA lowers to vectorized dynamic slices -- the one-hot
        form below was ~2.9 TFLOP of dense f32 matmul per compare at
        the 8 MPix bucket and dominated block_diff_map
        (tpu_r05_cmpprof_8m.json: 286 of 371 ms);
      * one-hot MXU contractions (GUETZLI_TPU_SEL_MATMUL=1), kept for
        A/B and for backends where pointwise-adjacent gathers
        serialize."""
    import os
    if os.environ.get("GUETZLI_TPU_SEL_MATMUL") == "1":
        hi = jax.lax.Precision.HIGHEST
        sy = _sel_matrix(ty, img.shape[-2])
        sx = _sel_matrix(tx, img.shape[-1])
        rows = jnp.einsum('rh,chw->crw', sy, img, precision=hi)
        return jnp.einsum('crw,xw->crx', rows, sx, precision=hi)
    rows = jnp.take(img, ty, axis=-2)
    return jnp.take(rows, tx, axis=-1)


def mask_high_intensity_change_dyn(xyb0, xyb1, w, h):
    ave = (xyb0 + xyb1) * 0.5
    y = ave[1]
    hp, wp = y.shape
    row = jnp.arange(hp, dtype=jnp.int32)[:, None]
    col = jnp.arange(wp, dtype=jnp.int32)[None, :]
    big = jnp.float32(-1.0)

    def sq_shift(dy, dx):
        shifted = jnp.roll(jnp.roll(y, -dy, axis=0), -dx, axis=1)
        d = shifted - y
        d = d * d
        if dx == -1:
            valid = col >= 1
        elif dx == 1:
            valid = col + 1 < w
        elif dy == -1:
            valid = row >= 1
        else:
            valid = row + 1 < h
        return jnp.where(jnp.broadcast_to(valid, (hp, wp)), d, big)

    sqr_max = jnp.maximum(
        jnp.maximum(sq_shift(0, -1), sq_shift(0, 1)),
        jnp.maximum(sq_shift(-1, 0), sq_shift(1, 0)))

    red = consts.MHIC_REDUCTION.astype(np.float32)
    chroma = np.float32(consts.MHIC_CHROMA_BALANCE)
    chroma_scale = chroma / (y + chroma)
    mix = jnp.stack([
        chroma_scale * np.float32(red[0]) / (sqr_max + np.float32(red[0])),
        np.float32(red[1]) / (sqr_max + np.float32(red[1])),
        chroma_scale * np.float32(red[2]) / (sqr_max + np.float32(red[2])),
    ])
    out0 = mix * xyb0 + (1.0 - mix) * ave
    out1 = mix * xyb1 + (1.0 - mix) * ave
    return out0, out1


def edge_detector_map_dyn(xyb0, xyb1, w, h, sc, step=3):
    _, hp, wp = xyb0.shape
    vm = _vmask(hp, wp, w, h)
    pairs = [blur_dyn(jnp.stack([xyb0[c] * vm, xyb1[c] * vm]), s,
                      *sc["ed%d" % c])
             for c, s in enumerate(consts.EDGE_DETECTOR_SIGMAS)]
    blurred0 = jnp.stack([p[0] for p in pairs])
    blurred1 = jnp.stack([p[1] for p in pairs])

    wgt = np.float32(consts.EDGE_DETECTOR_W)

    def dir_diff(b, axis):
        fwd = jnp.roll(b, -3, axis=axis)
        back = jnp.roll(b, 3, axis=axis)
        return wgt * (back - fwd)

    dh0 = dir_diff(blurred0, 2)
    dh1 = dir_diff(blurred1, 2)
    dv0 = dir_diff(blurred0, 1)
    dv1 = dir_diff(blurred1, 1)

    def lf_sq(d0, d1):
        vx0, vy0, vz0 = bd.xyb_low_freq_to_vals(d0[0], d0[1], d0[2])
        vx1, vy1, vz1 = bd.xyb_low_freq_to_vals(d1[0], d1[1], d1[2])
        return jnp.stack([(vx0 - vx1) ** 2, (vy0 - vy1) ** 2,
                          (vz0 - vz1) ** 2])

    hmap = lf_sq(dh0, dh1)
    vmap = lf_sq(dv0, dv1)

    xs = jnp.arange(wp, dtype=jnp.int32)
    ys = jnp.arange(hp, dtype=jnp.int32)
    h_valid_x = (xs >= 3) & (xs + 3 < w)          # [wp], row-independent
    v_valid_y = (ys >= 3) & (ys + 3 < h)          # [hp]

    rx, rx_ok = _res_positions_dyn(wp, w, step, 8 - step)
    ry, ry_ok = _res_positions_dyn(hp, h, step, 8 - step)
    px = jnp.clip(jnp.minimum(rx, w - 8), 0)
    py = jnp.clip(jnp.minimum(ry, h - 8), 0)

    ny, nx = len(ry), len(rx)
    acc = jnp.zeros((3, ny, nx))
    cnt = jnp.zeros((ny, nx))
    # One selection pass for both corner offsets of both maps: rows/cols
    # (py, py+7) x (px, px+7) of the stacked [6, hp, wp] tensor, then the
    # four (oy, ox) combinations are static slices of the [6, 2ny, 2nx]
    # result. Validity bits ride along as planes 7/8 so no separate
    # gathers are needed.
    hvx = jnp.broadcast_to(h_valid_x[None, :].astype(hmap.dtype),
                           (hp, wp))
    vvy = jnp.broadcast_to(v_valid_y[:, None].astype(vmap.dtype),
                           (hp, wp))
    stacked = jnp.concatenate([hmap, vmap, hvx[None], vvy[None]], axis=0)
    sel = _select_yx(stacked, jnp.concatenate([py, py + 7]),
                     jnp.concatenate([px, px + 7]))   # [8, 2ny, 2nx]
    for oy, ox in ((0, 0), (1, 0), (0, 1), (1, 1)):
        blk = sel[:, oy * ny:(oy + 1) * ny, ox * nx:(ox + 1) * nx]
        hv = blk[6] > 0.5
        vv = blk[7] > 0.5
        acc = (acc + jnp.where(hv[None], blk[0:3], 0.0)
               + jnp.where(vv[None], blk[3:6], 0.0))
        cnt = cnt + hv.astype(acc.dtype) + vv.astype(acc.dtype)

    grid_ok = ry_ok[:, None] & rx_ok[None, :]
    mul = (np.float32(consts.EDGE_DETECTOR_WEIGHT) * 8.0
           / jnp.where(cnt > 0, cnt, 1.0))
    out = acc * mul[None]                           # [3, ny, nx]
    out = jnp.where(grid_ok[None], out, 0.0)
    return _pad_to_res_cm(out, wp, hp, step)


def _use_lanes_blockdiff():
    """Whole-image block diff formulation: lane-major on accelerators
    (GUETZLI_TPU_LANE_SAFE=1/0 overrides). The window-major form
    materializes a [6, ny, 8, nx, 8] tensor whose minor dim 8 the TPU
    T(8,128) layout pads 16x — 25.6 GB for an 8-wide quant wave at
    1 MPix (the round-2 mpix1 OOM); the lane-major form keeps every
    plane-scale tensor's minor dim at lane width. CPU keeps the
    window-major form: its rounding is pinned by the golden corpus."""
    from guetzli_tpu.ops.layout import lane_safe
    return lane_safe()


def block_diff_map_dyn(xyb0, xyb1, w, h, step=3):
    """-> channel-major (dc, ac) maps [3, RY, RX] on the res grid."""
    _, hp, wp = xyb0.shape
    rx, rx_ok = _res_positions_dyn(wp, w, step, 8 - step - 1)
    ry, ry_ok = _res_positions_dyn(hp, h, step, 8 - step - 1)
    px = jnp.clip(jnp.minimum(rx, w - 8), 0)
    py = jnp.clip(jnp.minimum(ry, h - 8), 0)
    ny, nx = len(py), len(px)
    e8 = jnp.arange(8, dtype=jnp.int32)

    if _use_lanes_blockdiff():
        # Lane-major: select rows dy-major / columns dx-major so the
        # window split is a [6, 8, ny, 8, nx] reshape (minor dims nx and
        # 8-aligned sublanes — no tiled-layout blowup), then run the
        # tiles-last ButteraugliBlockDiff with ny*nx blocks in lanes.
        from guetzli_tpu.ops import tiles_lanes as tl
        ty = (e8[:, None] + py[None, :]).reshape(-1)     # [8*ny]
        tx = (e8[:, None] + px[None, :]).reshape(-1)     # [8*nx]
        both = _select_yx(jnp.concatenate([xyb0, xyb1], axis=0), ty, tx)
        both = both.reshape(6, 8, ny, 8, nx).transpose(0, 1, 3, 2, 4)
        both = both.reshape(6, 8, 8, ny * nx)            # [6, y, x, N]
        # dot=False DELIBERATELY: the dot_general (MXU) contraction form
        # measured 2.4x on the whole 8 MPix compare (371 -> 152 ms,
        # tpu_r05_cmpprof_dot_8m.json) and is numerically correct to
        # 4.4e-7 rel -- but that rounding drift flipped a knife-edge
        # quant-search decision on one pinned golden row
        # (photo_mosaic1-420.jpg +30% size, tpu_r05_goldens_dot.json
        # 98/99). Any non-bit-exact change can flip such a row; the
        # golden contract therefore pins the unrolled fixed-order form
        # here. The banked profile marks the upside if a future round
        # re-pins the goldens.
        dc, ac, _edge = tl.block_diff_lanes(both[0:3], both[3:6],
                                            dot=False)
        dc = dc.reshape(3, ny, nx)
        ac = ac.reshape(3, ny, nx)
    else:
        # Window-major (CPU): 8x8 windows of both images in one selection
        # pass over the stacked [6, hp, wp] tensor.
        ty = (py[:, None] + e8[None, :]).reshape(-1)     # [ny*8]
        tx = (px[:, None] + e8[None, :]).reshape(-1)     # [nx*8]
        both = _select_yx(jnp.concatenate([xyb0, xyb1], axis=0), ty, tx)
        both = both.reshape(6, ny, 8, nx, 8).transpose(1, 3, 0, 2, 4)
        w0 = both[:, :, 0:3].reshape(ny, nx, 3, 64)
        w1 = both[:, :, 3:6].reshape(ny, nx, 3, 64)
        dc, ac, _edge = bd.block_diff(w0, w1)
        dc = jnp.moveaxis(dc, -1, 0)
        ac = jnp.moveaxis(ac, -1, 0)
    grid_ok = (ry_ok[:, None] & rx_ok[None, :])[None]
    dc = jnp.where(grid_ok, dc, 0.0)
    ac = jnp.where(grid_ok, ac, 0.0)
    return _pad_to_res_cm(dc, wp, hp, step), _pad_to_res_cm(ac, wp, hp, step)


def edge_detector_low_freq_dyn(xyb0, xyb1, ac_map, w, h, sc, step=3):
    _, hp, wp = xyb0.shape
    vm = _vmask(hp, wp, w, h)
    both = blur_dyn(jnp.stack([xyb0 * vm[None], xyb1 * vm[None]]),
                    consts.EDGE_LF_SIGMA, *sc["edlf"])
    e = both[1] - both[0]

    ys, ys_ok = _res_positions_dyn(hp, h, step, 8)
    xs, xs_ok = _res_positions_dyn(wp, w, step, 8)

    # All row/column offsets the four directions need, in one selection
    # pass: rows {ys, ys+8, ys+6}, cols {xs, xs+8, xs+6, max(xs-6, 0)}.
    ny, nx = len(ys), len(xs)
    sel = _select_yx(
        e, jnp.concatenate([ys, ys + 8, ys + 6]),
        jnp.concatenate([xs, xs + 8, xs + 6, jnp.maximum(xs - 6, 0)]))

    def shifted(ri, ci):
        return sel[:, ri * ny:(ri + 1) * ny, ci * nx:(ci + 1) * nx]

    base = shifted(0, 0)
    diffs = [
        base - shifted(0, 1),     # (0, +8)
        base - shifted(1, 0),     # (+8, 0)
        base - shifted(2, 2),     # (+6, +6)
    ]
    dx4 = jnp.where((xs < 8)[None, None, :],
                    jnp.zeros_like(base),
                    base - shifted(2, 3))    # (+6, -6)
    diffs.append(dx4)

    per_k = []
    for d in diffs:
        sx, sy, sz = bd.xyb_diff_low_freq_squared(d[0], d[1], d[2])
        per_k.append(jnp.stack([sx, sy, sz]))
    md = jnp.maximum(jnp.maximum(per_k[0], per_k[1]),
                     jnp.maximum(per_k[2], per_k[3]))
    grid_ok = ys_ok[:, None] & xs_ok[None, :]
    add = md * np.float32(consts.EDGE_LF_MUL)       # [3, ny, nx]
    add = jnp.where(grid_ok[None], add, 0.0)

    off = 8 // step
    pad_y = ac_map.shape[-2] - add.shape[-2]
    pad_x = ac_map.shape[-1] - add.shape[-1] - off
    add_full = jnp.pad(add, ((0, 0), (0, pad_y), (off, pad_x)))
    return ac_map + add_full


def diff_precompute_dyn(xyb0, xyb1, w, h):
    _, hp, wp = xyb0.shape
    row = jnp.arange(hp, dtype=jnp.int32)[None, :, None]
    col = jnp.arange(wp, dtype=jnp.int32)[None, None, :]

    def vals(d):
        vx = bd.color_diff_dx_hf(d[0] * np.float32(consts.XYB_HF_XMUL))
        vy = bd.color_diff_dy_hf(d[1] * np.float32(consts.XYB_HF_YMUL))
        vz = d[2] * np.float32(consts.XYB_HF_ZMUL)
        return jnp.stack([vx, vy, vz])

    def sup(img):
        # neighbor at x+1, or x-1 on the (dynamic) right border
        right = jnp.where(col + 1 == w, jnp.roll(img, 1, axis=2),
                          jnp.roll(img, -1, axis=2))
        down = jnp.where(row + 1 == h, jnp.roll(img, 1, axis=1),
                         jnp.roll(img, -1, axis=1))
        vh = vals(img - right)
        vv = vals(img - down)
        return jnp.abs(vh) + jnp.abs(vv)

    return jnp.minimum(sup(xyb0), sup(xyb1))


def mask_dyn(xyb0, xyb1, w, h, sc):
    _, hp, wp = xyb0.shape
    vm = _vmask(hp, wp, w, h)
    m = diff_precompute_dyn(xyb0, xyb1, w, h)
    m = jnp.where(vm[None], m, 0.0)               # zero-pad semantics
    chans = []
    for c in range(3):
        mc = average5x5(m[c])
        mc = jnp.where(vm, mc, jnp.inf)           # out-of-image skipped
        mc = min_square_val(mc, 4, 0)
        mc = jnp.where(vm, mc, 0.0)
        mc = blur_dyn(mc, consts.MASK_SIGMAS[c], *sc["mask%d" % c])
        chans.append(mc)
    s = jnp.stack(chans)
    p = s * consts.MASK_W.astype(np.float32)[:, None, None]

    g2 = np.float32(consts.K_GLOBAL_SCALE * consts.K_GLOBAL_SCALE)
    mask_out = jnp.stack([
        bd.mask_lut('x', p[0]),
        bd.mask_lut('y', p[1]),
        bd.mask_lut('b', p[2]),
    ]) * g2
    mask_dc = jnp.stack([
        bd.mask_lut('dc_x', p[0]),
        bd.mask_lut('dc_y', p[1]),
        bd.mask_lut('dc_b', p[2]),
    ]) * g2
    return mask_out, mask_dc


def combine_channels_dyn(mask_xyb, mask_dc, dc_map, ac_map, edge_map,
                         w, h, hp, wp, step=3):
    """dc/ac/edge maps are channel-major [3, RY, RX]."""
    ry, ry_ok = _res_positions_dyn(hp, h, step, 8 - step)
    rx, rx_ok = _res_positions_dyn(wp, w, step, 8 - step)
    both = _select_yx(jnp.concatenate([mask_xyb, mask_dc], axis=0),
                      ry + 3, rx + 3)
    msel, dsel = both[0:3], both[3:6]
    ny, nx = len(ry), len(rx)
    dc = dc_map[:, :ny, :nx]
    ac = ac_map[:, :ny, :nx]
    em = edge_map[:, :ny, :nx]
    hi = jax.lax.Precision.HIGHEST
    res = (jnp.einsum('cyx,cyx->yx', dc, dsel, precision=hi)
           + jnp.einsum('cyx,cyx->yx', ac, msel, precision=hi)
           + jnp.einsum('cyx,cyx->yx', em, msel, precision=hi))
    return jnp.where(ry_ok[:, None] & rx_ok[None, :], res, 0.0)


def calculate_diffmap_dyn(res_map, w, h, sc, hp, wp, step=3):
    s2 = (8 - step) // 2
    s = 8 - step
    slope = np.float32(consts.DIFFMAP_INITIAL_SLOPE)
    val = jnp.where(res_map < 1.0 / (slope * slope),
                    slope * res_map, jnp.sqrt(res_map))
    up = jnp.repeat(jnp.repeat(val, step, axis=0), step, axis=1)
    # Place at offset (s2, s2) in an [hp, wp] canvas, masked to the
    # valid region (the static path's min(ny*step, h-s2) crop).
    up = jnp.pad(up, ((s2, max(0, hp - s2 - up.shape[0])),
                      (s2, max(0, wp - s2 - up.shape[1]))))[:hp, :wp]
    dm = jnp.where(_vmask(hp, wp, w, h), up, 0.0)

    # Clustered blur of the inner (w-s, h-s) region: shift its origin to
    # (0, 0) so the sigma>=3 stride grid aligns with the static path.
    inner = jnp.pad(dm[s2:, s2:], ((0, s2), (0, s2)))
    inner_ok = _vmask(hp, wp, w - s, h - s)
    inner = jnp.where(inner_ok, inner, 0.0)
    blurred = blur_dyn(inner, consts.DIFFMAP_SIGMA, *sc["diffmap"])
    add = jnp.where(inner_ok, np.float32(consts.DIFFMAP_MUL1) * blurred,
                    0.0)
    dm = dm + jnp.pad(add, ((s2, 0), (s2, 0)))[:hp, :wp]
    return dm * np.float32(1.0 / (1.0 + consts.DIFFMAP_MUL1))


def diffmap_opsin_dynamics_dyn(xyb0, xyb1, w, h, sc, step=3):
    """Padded full metric: [3, Hp, Wp] opsin images + true (w, h) ->
    [Hp, Wp] diffmap, zero outside the valid region. Requires
    min(w, h) >= 8 (the processor's <32x32 path never reaches here)."""
    _, hp, wp = xyb0.shape
    xyb0m, xyb1m = mask_high_intensity_change_dyn(xyb0, xyb1, w, h)
    edge_map = edge_detector_map_dyn(xyb0m, xyb1m, w, h, sc, step)
    dc_map, ac_map = block_diff_map_dyn(xyb0m, xyb1m, w, h, step)
    ac_map = edge_detector_low_freq_dyn(xyb0m, xyb1m, ac_map, w, h, sc,
                                        step)
    mask_xyb, mask_dc = mask_dyn(xyb0m, xyb1m, w, h, sc)
    res = combine_channels_dyn(mask_xyb, mask_dc, dc_map, ac_map,
                               edge_map, w, h, hp, wp, step)
    return calculate_diffmap_dyn(res, w, h, sc, hp, wp, step)
