"""Butteraugli comparator: the metric-side driver of the search.

Functional TPU redesign of guetzli/butteraugli_comparator.{h,cc}: instead of
an OO hierarchy with per-call host<->device copies, a `Comparator` instance
precomputes the original image's opsin once, keeps it device-resident, and
exposes three jitted entry points:

  * compare(coeffs)           -- full diffmap + max score
                                 (ButteraugliComparator::Compare, :60-70)
  * block state precompute    -- whole-image mask + per-block opsin tiles and
                                 mask scales (StartBlockComparisons :72-79 +
                                 SwitchBlock :85-111, hoisted out of the loop)
  * compare_block_batch(...)  -- CompareBlock (:113-163) over all blocks at
                                 once

Each jit is compiled once per image geometry and reused for every search
iteration.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from guetzli_tpu import consts
from guetzli_tpu.ops import diffmap as dm
from guetzli_tpu.ops import image as img_ops
from guetzli_tpu.ops import tiles as tile_ops
from guetzli_tpu.ops.opsin import (opsin_dynamics_image,
                                   opsin_dynamics_image_dyn)
from guetzli_tpu.ops.padgeom import PadGeom


def score_jpeg(distance, size, target):
    """ScoreJPEG (score.cc:23-41)."""
    k_scale = 50.0
    k_max_exponent = 10.0
    k_large = 1e30
    diff = distance - target
    if diff <= 0.0:
        return float(size)
    exponent = k_scale * diff
    if exponent > k_max_exponent:
        return k_large * math.exp(k_max_exponent) * diff + size
    return math.exp(exponent) * size


@partial(jax.jit, static_argnames=("bw", "bh", "w", "h"))
def _full_compare(coeffs, xyb0, bw, bh, w, h):
    lin = img_ops.coeffs_to_linear_rgb(coeffs, bw, bh, w, h)
    xyb1 = opsin_dynamics_image(lin)
    dmap = dm.diffmap_opsin_dynamics(xyb0, xyb1)
    return dm.score_from_diffmap(dmap), dmap


@partial(jax.jit, static_argnames=("bw", "bh", "w", "h"))
def _chroma_byte_planes(u_coeffs, v_coeffs, bw, bh, w, h):
    return jnp.stack([
        img_ops.chroma_byte_plane(u_coeffs, bw, bh, w, h),
        img_ops.chroma_byte_plane(v_coeffs, bw, bh, w, h)])


def _pool_max(x, wy, wx):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (wy, wx), (wy, wx),
        padding=[(0, 0), (0, 0)])


def _dilate_max(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (3, 3), (1, 1),
        padding=[(1, 1), (1, 1)])


def _weights_all_radii_impl(distmap, target, sizex, sizey, bw, bh,
                            direction_pos):
    """ComputeBlockErrorAdjustmentWeights for all rblock radii 1..4 on
    device (butteraugli_comparator.cc:169-233) -> [4, bw*bh] float32.

    Keeps the distmap device-resident: the back-end loop pulls only these
    small per-block weights instead of the full-resolution distmap."""
    h, w = distmap.shape
    pad = jnp.zeros((bh * sizey, bw * sizex), distmap.dtype)
    pad = pad.at[:h, :w].set(distmap)
    max_dist = _pool_max(pad, sizey, sizex)              # [bh, bw]

    weights = []
    local = max_dist
    if direction_pos:
        for _ in range(4):
            local = _dilate_max(local)
            ml = jnp.maximum(local, target)
            w_r = ((max_dist <= target)
                   & (ml <= 1.1 * target)).astype(jnp.float32)
            weights.append(w_r)
    else:
        for r in range(1, 5):
            local = _dilate_max(local)
            ml = jnp.maximum(local, target)
            src = max_dist > (0.5 * target + 0.5 * ml)
            w_r = jnp.zeros_like(max_dist)
            reach = src
            for d in range(r + 1):
                w_r = jnp.maximum(
                    w_r, jnp.where(reach, jnp.float32(1.0 / (d + 1)), 0.0))
                if d < r:
                    p = jnp.pad(reach, 1)
                    reach = (p[0:-2, 0:-2] | p[0:-2, 1:-1] | p[0:-2, 2:]
                             | p[1:-1, 0:-2] | p[1:-1, 1:-1] | p[1:-1, 2:]
                             | p[2:, 0:-2] | p[2:, 1:-1] | p[2:, 2:])
            weights.append(w_r)
    return jnp.stack(weights).reshape(4, bw * bh)


_weights_all_radii = jax.jit(
    _weights_all_radii_impl,
    static_argnames=("sizex", "sizey", "bw", "bh", "direction_pos"))


@partial(jax.jit, static_argnames=("bw", "bh", "w", "h", "sizex", "sizey",
                                   "gbw", "gbh", "direction_pos"))
def _compare_weights_444(coeffs, xyb0, target, bw, bh, w, h,
                         sizex, sizey, gbw, gbh, direction_pos):
    lin = img_ops.coeffs_to_linear_rgb(coeffs, bw, bh, w, h)
    xyb1 = opsin_dynamics_image(lin)
    dmap = dm.diffmap_opsin_dynamics(xyb0, xyb1)
    w4 = _weights_all_radii_impl(
        dmap, target, sizex, sizey, gbw, gbh, direction_pos)
    return dm.score_from_diffmap(dmap), dmap, w4


def _cw444_dyn_core(coeffs, xyb0, target, w, h, sc,
                    bwp, bhp, wp, hp, sizex, sizey, gbwp, gbhp,
                    direction_pos):
    """Bucket-shaped fused compare+weights: shapes fixed by the padded
    bucket, true (w, h) traced (ops/padgeom.py). One compile per bucket."""
    lin = img_ops.coeffs_to_linear_rgb(coeffs, bwp, bhp, wp, hp)
    xyb1 = opsin_dynamics_image_dyn(lin, w, h, sc)
    dmap = dm.diffmap_opsin_dynamics_dyn(xyb0, xyb1, w, h, sc)
    w4 = _weights_all_radii_impl(
        dmap, target, sizex, sizey, gbwp, gbhp, direction_pos)
    return dm.score_from_diffmap(dmap), dmap, w4


_DYN_STATICS_444 = ("bwp", "bhp", "wp", "hp", "sizex", "sizey", "gbwp",
                    "gbhp", "direction_pos")
_compare_weights_444_dyn = partial(
    jax.jit, static_argnames=_DYN_STATICS_444)(_cw444_dyn_core)


@partial(jax.jit, static_argnames=_DYN_STATICS_444)
def _batch_compare_weights_444_dyn(coeffs, xyb0, target, w, h, sc,
                                   bwp, bhp, wp, hp, sizex, sizey,
                                   gbwp, gbhp, direction_pos):
    """One program per lockstep round over B same-bucket images: vmap of
    the fused compare+weights (array args carry a leading batch axis)."""
    core = partial(_cw444_dyn_core, bwp=bwp, bhp=bhp, wp=wp, hp=hp,
                   sizex=sizex, sizey=sizey, gbwp=gbwp, gbhp=gbhp,
                   direction_pos=direction_pos)
    return jax.vmap(core)(coeffs, xyb0, target, w, h, sc)


def _cw420_dyn_core(y_coeffs, u_coeffs, v_coeffs, xyb0, target,
                    w, h, sc, ybwp, ybhp, cbwp, cbhp, wp, hp,
                    sizex, sizey, gbwp, gbhp, direction_pos):
    srgb = img_ops.coeffs420_to_srgb_dyn(y_coeffs, u_coeffs, v_coeffs,
                                         ybwp, ybhp, cbwp, cbhp, wp, hp,
                                         w, h)
    xyb1 = opsin_dynamics_image_dyn(img_ops.srgb_to_linear(srgb), w, h, sc)
    dmap = dm.diffmap_opsin_dynamics_dyn(xyb0, xyb1, w, h, sc)
    w4 = _weights_all_radii_impl(
        dmap, target, sizex, sizey, gbwp, gbhp, direction_pos)
    return dm.score_from_diffmap(dmap), dmap, w4


_DYN_STATICS_420 = ("ybwp", "ybhp", "cbwp", "cbhp", "wp", "hp", "sizex",
                    "sizey", "gbwp", "gbhp", "direction_pos")
_compare_weights_420_dyn = partial(
    jax.jit, static_argnames=_DYN_STATICS_420)(_cw420_dyn_core)


@partial(jax.jit, static_argnames=_DYN_STATICS_420)
def _batch_compare_weights_420_dyn(y_coeffs, u_coeffs, v_coeffs, xyb0,
                                   target, w, h, sc, ybwp, ybhp, cbwp,
                                   cbhp, wp, hp, sizex, sizey, gbwp, gbhp,
                                   direction_pos):
    core = partial(_cw420_dyn_core, ybwp=ybwp, ybhp=ybhp, cbwp=cbwp,
                   cbhp=cbhp, wp=wp, hp=hp, sizex=sizex, sizey=sizey,
                   gbwp=gbwp, gbhp=gbhp, direction_pos=direction_pos)
    return jax.vmap(core)(y_coeffs, u_coeffs, v_coeffs, xyb0, target,
                          w, h, sc)


def _device_quantize(c, q):
    """Round coefficients to multiples of q (guetzli/quantize.h), exact
    int32 twin of search/state.quantize (C truncation semantics)."""
    r = jnp.sign(c) * (jnp.abs(c) % q)
    delta = jnp.where(2 * r > q, q - r,
                      jnp.where(-2 * r > q, -q - r, -r))
    return c + delta


@partial(jax.jit, static_argnames=_DYN_STATICS_444)
def _quant_batch_444_dyn(base, qs, xyb0, target, w, h, sc,
                         bwp, bhp, wp, hp, sizex, sizey, gbwp, gbhp,
                         direction_pos):
    """Evaluate B requantizations of the device-resident base coefficients
    in one program: qs [B, 3, 64] -> scores [B].

    TryQuantMatrix's compare (processor.cc:310-338) with the requantize
    (output_image.cc:349-360) moved on-device: each trial uploads 768
    bytes of quant matrix instead of the full coefficient planes. Only
    the scores leave the program: the adopted trial's diffmap is never
    read before the first back-end compare overwrites it (first_up_iter
    uses unit weights), and materializing the [B, Hp, Wp] stack cost
    ~250 MB of device traffic per wave at 8 MPix."""
    def one(q):
        coeffs = _device_quantize(base, q[:, None, :])
        s, _d, _w4 = _cw444_dyn_core(
            coeffs, xyb0, target, w, h, sc, bwp=bwp, bhp=bhp, wp=wp,
            hp=hp, sizex=sizex, sizey=sizey, gbwp=gbwp, gbhp=gbhp,
            direction_pos=direction_pos)
        return s
    return jax.vmap(one)(qs)


@partial(jax.jit, static_argnames=_DYN_STATICS_420)
def _quant_batch_420_dyn(ybase, ubase, vbase, qs, xyb0, target, w, h, sc,
                         ybwp, ybhp, cbwp, cbhp, wp, hp, sizex, sizey,
                         gbwp, gbhp, direction_pos):
    def one(q):
        s, _d, _w4 = _cw420_dyn_core(
            _device_quantize(ybase, q[0][None, :]),
            _device_quantize(ubase, q[1][None, :]),
            _device_quantize(vbase, q[2][None, :]),
            xyb0, target, w, h, sc, ybwp=ybwp, ybhp=ybhp, cbwp=cbwp,
            cbhp=cbhp, wp=wp, hp=hp, sizex=sizex, sizey=sizey, gbwp=gbwp,
            gbhp=gbhp, direction_pos=direction_pos)
        return s
    return jax.vmap(one)(qs)


@partial(jax.jit, donate_argnums=(0,))
def _scatter_coeffs_only(coeffs, cidx, cvals):
    """Apply one fixed-size chunk of per-coefficient deltas (no compare).
    Large flip waves are shipped as a sequence of these (async, in
    order) followed by one fused scatter+compare on the remainder: the
    per-iteration upload is then ~m*8 bytes + at most one chunk of
    padding, instead of a whole power-of-two bucket. The deployment's
    tunnel client never frees its host-side staging copy of an upload
    (measured ~8 MB leaked per 1M-entry bucket per iteration,
    NOTES.md), so bounding upload size also bounds that leak."""
    shape = coeffs.shape
    new = coeffs.reshape(-1).at[cidx].set(cvals, mode="drop")
    return new.reshape(shape)


@partial(jax.jit, static_argnames=_DYN_STATICS_444, donate_argnums=(0,))
def _scatter_coeff_compare_444_dyn(coeffs, cidx, cvals, xyb0, target, w, h,
                                   sc, bwp, bhp, wp, hp, sizex, sizey,
                                   gbwp, gbhp, direction_pos):
    """Per-COEFFICIENT variant of _scatter_compare_444_dyn: cidx [M] flat
    indexes into the [3, NBp, 64] state (c*NBp*64 + bp*64 + k; pad rows
    carry an out-of-range index and are dropped), cvals [M] int32 new
    values. A back-end iteration typically flips a few coefficients per
    changed block, so shipping (index, value) pairs cuts the per-iteration
    upload ~24-96x vs whole 3x64 blocks -- decisive through a tunnel
    whose H2D bandwidth, not the chip, bounds the loop."""
    shape = coeffs.shape
    new = coeffs.reshape(-1).at[cidx].set(cvals, mode="drop").reshape(shape)
    s, d, w4 = _cw444_dyn_core(
        new, xyb0, target, w, h, sc, bwp=bwp, bhp=bhp, wp=wp, hp=hp,
        sizex=sizex, sizey=sizey, gbwp=gbwp, gbhp=gbhp,
        direction_pos=direction_pos)
    return new, s, d, w4


@partial(jax.jit, static_argnames=_DYN_STATICS_444, donate_argnums=(0,))
def _scatter_compare_444_dyn(coeffs, bidx, bvals, xyb0, target, w, h, sc,
                             bwp, bhp, wp, hp, sizex, sizey, gbwp, gbhp,
                             direction_pos):
    """Apply the back-end flip loop's per-block coefficient updates to the
    device-resident state and run the fused compare+weights, in one
    program. bidx [M] padded-grid block indexes (out-of-range rows are
    dropped -- the fixed-size M buckets pad with bidx = NBp); bvals
    [M, 3, 64] the updated blocks. `coeffs` is donated: the returned
    array IS the new device state."""
    new = coeffs.at[:, bidx, :].set(bvals.transpose(1, 0, 2), mode="drop")
    s, d, w4 = _cw444_dyn_core(
        new, xyb0, target, w, h, sc, bwp=bwp, bhp=bhp, wp=wp, hp=hp,
        sizex=sizex, sizey=sizey, gbwp=gbwp, gbhp=gbhp,
        direction_pos=direction_pos)
    return new, s, d, w4


@partial(jax.jit, static_argnames=("cbwp", "cbhp", "wp", "hp"))
def _chroma_byte_planes_dyn(u_coeffs, v_coeffs, w, h, cbwp, cbhp, wp, hp):
    return jnp.stack([
        img_ops.chroma_byte_plane_dyn(u_coeffs, cbwp, cbhp, wp, hp, w, h),
        img_ops.chroma_byte_plane_dyn(v_coeffs, cbwp, cbhp, wp, hp, w, h)])


@partial(jax.jit, static_argnames=("bwp", "bhp", "wp", "hp"))
def _y_byte_plane_dyn(y_coeffs, bwp, bhp, wp, hp):
    pix = img_ops.blocks_to_plane(
        img_ops.idct_blocks(y_coeffs) << 4, bwp, bhp, wp, hp)
    return img_ops.byte_plane(pix, wp)


@jax.jit
def _opsin_dyn_jit(lin, w, h, sc):
    return opsin_dynamics_image_dyn(lin, w, h, sc)


@jax.jit
def _whole_image_mask_dyn(xyb0, w, h, sc):
    mask_xyz, _ = dm.mask_dyn(xyb0, xyb0, w, h, sc)
    return mask_xyz


@partial(jax.jit, static_argnames=("ybw", "ybh", "cbw", "cbh", "w", "h",
                                   "sizex", "sizey", "gbw", "gbh",
                                   "direction_pos"))
def _compare_weights_420(y_coeffs, u_coeffs, v_coeffs, xyb0, target,
                         ybw, ybh, cbw, cbh, w, h,
                         sizex, sizey, gbw, gbh, direction_pos):
    srgb = img_ops.coeffs420_to_srgb(y_coeffs, u_coeffs, v_coeffs,
                                     ybw, ybh, cbw, cbh, w, h)
    xyb1 = opsin_dynamics_image(img_ops.srgb_to_linear(srgb))
    dmap = dm.diffmap_opsin_dynamics(xyb0, xyb1)
    w4 = _weights_all_radii_impl(
        dmap, target, sizex, sizey, gbw, gbh, direction_pos)
    return dm.score_from_diffmap(dmap), dmap, w4


@partial(jax.jit, static_argnames=("bw", "bh", "w", "h"))
def _y_byte_plane(y_coeffs, bw, bh, w, h):
    pix = img_ops.blocks_to_plane(
        img_ops.idct_blocks(y_coeffs) << 4, bw, bh, w, h)
    return img_ops.byte_plane(pix, w)


@jax.jit
def _whole_image_mask(xyb0):
    mask_xyz, _ = dm.mask(xyb0, xyb0)
    return mask_xyz


@jax.jit
def _compare_block_batch(cand_coeffs, xyb0_tiles, scale, ysel, xsel):
    lin = tile_ops.tiles_to_linear_rgb(cand_coeffs, xsel, ysel)
    return tile_ops.compare_blocks(xyb0_tiles, lin, scale)


class CompareBatcher:
    """Coalesces compare dispatches from several Comparators into ONE
    vmapped device program (and one result pull) per lockstep round.

    The lockstep corpus driver's dispatch-all/fetch-all rounds
    (parallel/lockstep.py) previously issued B small per-image programs
    and B pulls; on the tunneled TPU every pull is a ~80 ms round trip.
    With a shared batcher, dispatch_compare_with_weights enqueues a
    request and the first fetch flushes the whole round: requests are
    grouped by their static program key (bucket dims + weight grid +
    direction), stacked on the batch axis, and evaluated by the vmapped
    fused compare+weights — one program and one [B]-result pull per
    group per round. Thread-safe (the lockstep back-end phase runs
    per-image threads).
    """

    def __init__(self):
        import threading
        self._lock = threading.Lock()
        self._queue = []
        self._ready = {}
        self._next = 0

    def enqueue(self, kind, key, arrays):
        with self._lock:
            idx = self._next
            self._next += 1
            self._queue.append((idx, kind, key, arrays))
            return idx

    def _flush_locked(self):
        from collections import defaultdict
        groups = defaultdict(list)
        for idx, kind, key, arrays in self._queue:
            groups[(kind, key)].append((idx, arrays))
        self._queue = []
        launched = []
        for (kind, key), items in groups.items():
            idxs = [i for i, _ in items]
            # The batch axis is a compiled shape: pad each group to the
            # next power of two (repeating row 0) so a corpus run only ever
            # compiles log2(Bmax) program variants per key. Without this,
            # shrinking lockstep rounds and racy threaded flushes produce a
            # fresh batch size -- and a fresh multi-minute AOT compile --
            # per round. Pad rows are discarded below (results are indexed
            # by the real idxs only).
            rows = [a for _, a in items]
            bpad = 1 << (len(rows) - 1).bit_length()
            rows = rows + [rows[0]] * (bpad - len(rows))
            cols = list(zip(*rows))
            stack = [jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *c)
                     for c in cols]
            if kind == "444":
                out = _batch_compare_weights_444_dyn(*stack, **dict(key))
            else:
                out = _batch_compare_weights_420_dyn(*stack, **dict(key))
            launched.append((idxs, out))
        for idxs, (score, dmap, w4) in launched:
            score_np, w4_np = jax.device_get((score, w4))  # one pull
            for j, idx in enumerate(idxs):
                self._ready[idx] = (float(score_np[j]), dmap[j],
                                    np.asarray(w4_np[j]))

    def result(self, idx):
        with self._lock:
            if idx not in self._ready:
                self._flush_locked()
            return self._ready.pop(idx)


class Comparator:
    """Per-image butteraugli comparator with device-resident state."""

    def __init__(self, rgb, width, height, target_distance, padded=None,
                 mesh=None):
        import os
        self.width = width
        self.height = height
        self.target_distance = float(target_distance)
        self.rgb_orig = np.asarray(rgb, dtype=np.uint8).reshape(
            height, width, 3)
        if padded is None:
            from guetzli_tpu import config
            padded = config.current().padded
        self.geom = PadGeom(width, height) if padded else None
        if mesh is None:
            from guetzli_tpu.parallel.mesh import mesh_from_env
            mesh = mesh_from_env()
        self.mesh = mesh
        self.batcher = None      # set by the lockstep corpus driver
        self._upload_originals()
        self.distance = 0.0
        self.distmap = None
        # Block-comparison state (built lazily by start_block_comparisons).
        self._mask_xyz = None
        self._block_state = {}

    # -- sharded uploads (parallel/mesh.py; no-ops without a mesh) -------

    def _put_plane(self, x):
        """[..., H, W] image plane: rows sharded over the mesh."""
        if self.mesh is None:
            return jax.device_put(x)
        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = P(*([None] * (np.ndim(x) - 2) + ["tile", None]))
        return jax.device_put(x, NamedSharding(self.mesh, spec))

    def _put_blocks(self, x, axis=0):
        """Per-block array: the block axis sharded over the mesh."""
        if self.mesh is None:
            return jnp.asarray(x)
        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = [None] * np.ndim(x)
        spec[axis] = "tile"
        return jax.device_put(np.asarray(x),
                              NamedSharding(self.mesh, P(*spec)))

    def _upload_originals(self):
        lut = consts.SRGB_TO_LINEAR.astype(np.float32)
        lin0 = lut[self.rgb_orig].transpose(2, 0, 1)        # [3, H, W]
        if self.geom is not None:
            g = self.geom
            self._sc = {k: (jnp.asarray(sx), jnp.asarray(sy))
                        for k, (sx, sy) in g.scales().items()}
            self._wh = (jnp.int32(g.w), jnp.int32(g.h))
            self.xyb0 = self._put_plane(_opsin_dyn_jit(
                self._put_plane(jnp.asarray(g.pad_plane(lin0))),
                *self._wh, self._sc))
        else:
            self.xyb0 = self._put_plane(
                opsin_dynamics_image(self._put_plane(jnp.asarray(lin0))))

    def recover_device_state(self):
        """Rebuild device-resident state after a TPU worker crash (all
        device buffers are lost when the worker restarts). Host-side
        search state lives in numpy, so recovery is just re-uploading the
        original image's derived tensors."""
        self._upload_originals()
        self.distmap = None
        self._mask_xyz = None
        self._block_state = {}

    # -- full-image comparison ------------------------------------------

    def compare(self, coeffs, bw, bh):
        """coeffs: [3, bh*bw, 64] int32 dequantized YCbCr coefficients."""
        if self.geom is not None:
            g = self.geom
            cp = g.pad_blocks(np.asarray(coeffs), bw, bh, g.bwp, g.bhp)
            score, dmap, _ = _compare_weights_444_dyn(
                self._put_blocks(cp, axis=1), self.xyb0,
                jnp.float32(self.target_distance), *self._wh, self._sc,
                bwp=g.bwp, bhp=g.bhp, wp=g.wp, hp=g.hp,
                sizex=8, sizey=8, gbwp=g.bwp, gbhp=g.bhp,
                direction_pos=True)
        else:
            score, dmap = _full_compare(jnp.asarray(coeffs), self.xyb0,
                                        bw=bw, bh=bh, w=self.width,
                                        h=self.height)
        self.distance = float(score)
        self.distmap = dmap
        return self.distance

    def dispatch_compare(self, img):
        """Asynchronously dispatch a full compare of a CoeffImage.

        Reuses the fused compare+weights executable (weights ignored) so
        each image geometry compiles one diffmap program, not two --
        remote AOT compilation is minutes per program."""
        return self.dispatch_compare_with_weights(img, 1, 1.0, 1, 1)

    def fetch_compare_plain(self, handle):
        if isinstance(handle[0], str):
            score, dmap, _w4 = self.batcher.result(handle[1])
            self.distance = score
            self.distmap = dmap
            return self.distance
        score, dmap, _unused_w4, _factors = handle
        self.distance = float(score)
        self.distmap = dmap
        return self.distance

    def compare_img(self, img):
        """Compare a CoeffImage (444 or 420 chroma sampling)."""
        return self.fetch_compare_plain(self.dispatch_compare(img))

    # -- batched quant-matrix trials (search/quant_tree.py) --------------

    def supports_quant_batch(self):
        return self.geom is not None and self.batcher is None

    def quant_base_upload(self, img):
        """Device-upload the quant-search base (the dequantized input
        coefficients every trial requantizes from); returns an opaque
        base handle for dispatch_quant_batch."""
        g = self.geom
        if img.is_444():
            cp = g.pad_blocks(img.coeffs, img.bw, img.bh, g.bwp, g.bhp)
            return ("444", self._put_blocks(cp, axis=1))
        y, u, v = img.comps
        cbwp, cbhp = g.wp // 16, g.hp // 16
        return ("420",
                self._put_blocks(g.pad_blocks(y.coeffs, y.bw, y.bh,
                                              g.bwp, g.bhp)),
                self._put_blocks(g.pad_blocks(u.coeffs, u.bw, u.bh,
                                              cbwp, cbhp)),
                self._put_blocks(g.pad_blocks(v.coeffs, v.bw, v.bh,
                                              cbwp, cbhp)))

    # Fixed trial-batch sizes: one compiled program per (bucket, B).
    _QUANT_BATCH_SIZES = (4, 8)
    # HBM budget for one wave's transients, and the per-trial cost model
    # in *tiled-layout* bytes per padded pixel. The round-2 mpix1 OOM
    # showed logical pixels are the wrong unit: a minor-dim-8 plane-scale
    # tensor T(8,128)-pads 16x. With the lane-major block-diff windows
    # (ops/diffmap.block_diff_map_dyn) the dominant per-trial transients
    # are the [6, 8ny, 8nx] window selection (~170 B/px) plus its
    # reshape/transpose copies and the per-channel FFT planes; ~700 B/px
    # bounds the peak with slack for XLA scheduling.
    _QUANT_WAVE_HBM_BUDGET = 12 << 30
    _QUANT_TRIAL_BYTES_PER_PIXEL = 700

    def quant_batch_sizes(self):
        """Wave sizes permitted for this image geometry."""
        g = self.geom
        per_trial = g.wp * g.hp * self._QUANT_TRIAL_BYTES_PER_PIXEL
        cap = max(1, int(self._QUANT_WAVE_HBM_BUDGET // per_trial))
        sizes = tuple(s for s in self._QUANT_BATCH_SIZES if s <= cap)
        return sizes if sizes else (cap if cap < self._QUANT_BATCH_SIZES[0]
                                    else self._QUANT_BATCH_SIZES[0],)

    def dispatch_quant_batch(self, base, qs):
        """Evaluate len(qs) quant-matrix trials in one device program.
        Returns a handle; fetch_quant_scores completes it."""
        g = self.geom
        b = len(qs)
        sizes = self.quant_batch_sizes()
        bp = next((s for s in sizes if s >= b), sizes[-1])
        qs_np = np.stack([np.asarray(q, np.int32) for q in qs])
        if bp > b:
            qs_np = np.concatenate(
                [qs_np, np.repeat(qs_np[-1:], bp - b, axis=0)])
        qs_dev = jnp.asarray(qs_np[:bp])
        tgt = jnp.float32(self.target_distance)
        if base[0] == "444":
            scores = _quant_batch_444_dyn(
                base[1], qs_dev, self.xyb0, tgt, *self._wh, self._sc,
                bwp=g.bwp, bhp=g.bhp, wp=g.wp, hp=g.hp, sizex=8, sizey=8,
                gbwp=g.bwp, gbhp=g.bhp, direction_pos=True)
        else:
            scores = _quant_batch_420_dyn(
                base[1], base[2], base[3], qs_dev, self.xyb0, tgt,
                *self._wh, self._sc, ybwp=g.bwp, ybhp=g.bhp,
                cbwp=g.wp // 16, cbhp=g.hp // 16, wp=g.wp, hp=g.hp,
                sizex=8, sizey=8, gbwp=g.bwp, gbhp=g.bhp,
                direction_pos=True)
        return (scores, None, b)

    def fetch_quant_scores(self, handle):
        """[B] float scores (one pull)."""
        scores, _unused, b = handle
        return np.asarray(jax.device_get(scores))[:b].astype(np.float64)

    def set_quant_result(self, handle, row, score):
        """Adopt trial `row` of a fetched batch as the comparator's
        current distance. The distmap is deliberately left at its
        previous value: nothing reads it between quant selection and the
        first back-end compare (first_up_iter uses unit weights and the
        zeroing phase works from the frozen whole-image mask), and the
        per-trial [B, Hp, Wp] diffmap stacks were the quant phase's
        dominant device allocation at 8 MPix."""
        del handle, row
        self.distance = float(score)

    # -- device-resident back-end coefficient state ----------------------

    # Fixed changed-block counts: one scatter+compare program per
    # (bucket, M); oversize updates fall back to a full re-upload.
    # The top size must cover an 8 MPix grid's block count: overflowing
    # the ladder falls back to a FULL coefficient re-upload per
    # iteration (~130 MB at 8 MPix over a ~50 MB/s link).
    _SPARSE_SIZES = (512, 4096, 32768, 262144)

    def backend_sync_full(self, img):
        """Upload the full padded coefficient state for the back-end flip
        loop; dispatch_compare_sparse applies per-iteration deltas to it.
        444-only (the chroma passes use the plain upload path)."""
        g = self.geom
        self._dev_coeffs = jnp.asarray(
            g.pad_blocks(img.coeffs, img.bw, img.bh, g.bwp, g.bhp))
        self._dev_grid = (img.bw, img.bh)

    def supports_sparse(self, img, comp_mask):
        # Sparse handles bypass the lockstep CompareBatcher by design
        # (per-image device-resident state); the corpus driver completes
        # them through fetch_compare_many, so a set batcher is no longer
        # an exclusion -- full-plane re-uploads per iteration were the
        # corpus back-end's dominant tunnel cost.
        return (self.geom is not None and self.mesh is None
                and comp_mask == 7 and img.is_444())

    # Fixed changed-coefficient counts for the per-coefficient delta
    # path: one scatter+compare program per (bucket, M).
    # Fused scatter+compare rungs; flip waves beyond the top rung ship
    # their excess through fixed-size _scatter_coeffs_only chunks first,
    # so arbitrarily large waves (8 MPix first up-iterations flip
    # millions of coefficients) never fall back to whole-block or
    # full-plane uploads.
    # Top rung sized for multi-MPix flip waves: the 8 MPix up phase
    # flips ~1-5M coefficients per iteration, which the old 65536 top
    # rung turned into ~75 sequential chunk dispatches (~0.8 s/iter of
    # backend_dispatch, tpu_r05_large8d.json); a 1M rung ships the wave
    # as ONE fused scatter+compare with an 8 MB operand instead. One
    # extra (cached) compile per geometry.
    _SPARSE_COEFF_SIZES = (2048, 16384, 65536, 262144, 1048576)
    _SPARSE_COEFF_CHUNK = 1048576

    def dispatch_compare_sparse_coeffs(self, img, blocks_idx, cks, vals,
                                       direction, target_mul,
                                       factor_x, factor_y):
        """Per-coefficient variant of dispatch_compare_sparse: the flip
        loop's exact (block, c*64+k, new value) triplets, ~8 bytes per
        flipped coefficient instead of 772 per changed block. Waves
        larger than the top rung are applied as a sequence of fixed-size
        scatter-only chunks (async, in dispatch order) before the fused
        scatter+compare on the remainder."""
        g = self.geom
        bw, _bh = self._dev_grid
        m = len(blocks_idx)
        nbp = g.bwp * g.bhp
        cidx_all = np.empty(m, dtype=np.int32)
        cvals_all = np.empty(m, dtype=np.int32)
        if m:
            bp = (blocks_idx // bw) * g.bwp + blocks_idx % bw
            cidx_all[:] = ((cks >> 6) * (nbp * 64) + bp * 64
                           + (cks & 63)).astype(np.int32)
            cvals_all[:] = vals
        chunk = self._SPARSE_COEFF_CHUNK
        pos = 0
        while m - pos > self._SPARSE_COEFF_SIZES[-1]:
            self._dev_coeffs = _scatter_coeffs_only(
                self._dev_coeffs, jnp.asarray(cidx_all[pos:pos + chunk]),
                jnp.asarray(cvals_all[pos:pos + chunk]))
            pos += chunk
        rem = m - pos
        mp = next(s for s in self._SPARSE_COEFF_SIZES if s >= max(rem, 1))
        cidx = np.full(mp, 3 * nbp * 64, dtype=np.int32)   # OOB = dropped
        cvals = np.zeros(mp, dtype=np.int32)
        if rem:
            cidx[:rem] = cidx_all[pos:]
            cvals[:rem] = cvals_all[pos:]
        sizex, sizey = 8 * factor_x, 8 * factor_y
        statics = dict(bwp=g.bwp, bhp=g.bhp, wp=g.wp, hp=g.hp,
                       sizex=sizex, sizey=sizey,
                       gbwp=g.wp // sizex, gbhp=g.hp // sizey,
                       direction_pos=direction > 0)
        new, score, dmap, w4 = _scatter_coeff_compare_444_dyn(
            self._dev_coeffs, jnp.asarray(cidx), jnp.asarray(cvals),
            self.xyb0, jnp.float32(self.target_distance * target_mul),
            *self._wh, self._sc, **statics)
        self._dev_coeffs = new
        return (score, dmap, w4, (factor_x, factor_y))

    def dispatch_compare_sparse(self, img, changed, direction, target_mul,
                                factor_x, factor_y):
        """dispatch_compare_with_weights, but uploading only the blocks
        the flip loop changed (scatter fused into the compare program).
        `changed`: int array of changed block indexes on the real grid."""
        g = self.geom
        bw, bh = self._dev_grid
        m = len(changed)
        if m > self._SPARSE_SIZES[-1] or m > g.bwp * g.bhp:
            self.backend_sync_full(img)
            changed = np.empty(0, dtype=np.int64)
            m = 0
        mp = next(s for s in self._SPARSE_SIZES if s >= max(m, 1))
        bidx = np.full(mp, g.bwp * g.bhp, dtype=np.int32)  # OOB = dropped
        bvals = np.zeros((mp, 3, 64), dtype=np.int32)
        if m:
            bidx[:m] = ((changed // bw) * g.bwp + changed % bw)
            bvals[:m] = np.stack(
                [c.coeffs[changed] for c in img.comps], axis=1)
        sizex, sizey = 8 * factor_x, 8 * factor_y
        statics = dict(bwp=g.bwp, bhp=g.bhp, wp=g.wp, hp=g.hp,
                       sizex=sizex, sizey=sizey,
                       gbwp=g.wp // sizex, gbhp=g.hp // sizey,
                       direction_pos=direction > 0)
        new, score, dmap, w4 = _scatter_compare_444_dyn(
            self._dev_coeffs, jnp.asarray(bidx), jnp.asarray(bvals),
            self.xyb0, jnp.float32(self.target_distance * target_mul),
            *self._wh, self._sc, **statics)
        self._dev_coeffs = new
        return (score, dmap, w4, (factor_x, factor_y))

    # -- 420 per-block evaluation state ---------------------------------

    def frozen_chroma_blocks(self, img):
        """[NBy, 2, 8, 8] frozen chroma bytes per full-res 8x8 block for
        the 420 Y pass (edge bytes replicated by clamped gather). Padded
        mode: NBy is the bucket grid."""
        u, v = img.comps[1], img.comps[2]
        w, h = self.width, self.height
        bw, bh = (w + 7) // 8, (h + 7) // 8
        if self.geom is not None:
            g = self.geom
            cbwp, cbhp = g.wp // 16, g.hp // 16
            up = g.pad_blocks(u.coeffs, u.bw, u.bh, cbwp, cbhp)
            vp = g.pad_blocks(v.coeffs, v.bw, v.bh, cbwp, cbhp)
            planes = np.asarray(_chroma_byte_planes_dyn(
                jnp.asarray(up), jnp.asarray(vp), *self._wh,
                cbwp=cbwp, cbhp=cbhp, wp=g.wp, hp=g.hp))
        else:
            planes = np.asarray(_chroma_byte_planes(
                jnp.asarray(u.coeffs), jnp.asarray(v.coeffs),
                bw=u.bw, bh=u.bh, w=w, h=h))
        gx = np.minimum(
            (np.tile(np.arange(bw), bh)[:, None] * 8
             + np.arange(8)[None, :]), w - 1)          # [NB, 8]
        gy = np.minimum(
            (np.repeat(np.arange(bh), bw)[:, None] * 8
             + np.arange(8)[None, :]), h - 1)
        out = planes[:, gy[:, :, None], gx[:, None, :]] \
            .transpose(1, 0, 2, 3)                     # [NB, 2, 8, 8]
        if self.geom is not None:
            g = self.geom
            out = g.pad_blocks(out.reshape(bw * bh, -1), bw, bh,
                               g.bwp, g.bhp).reshape(-1, 2, 8, 8)
        return self._put_blocks(out)

    def frozen_y_16x16(self, img, cbw, cbh):
        """[NBc, 16, 16] frozen Y bytes per 16x16 macroblock for the 420
        chroma pass. Padded mode: NBc is the bucket chroma grid."""
        y = img.comps[0]
        w, h = self.width, self.height
        if self.geom is not None:
            g = self.geom
            yp = g.pad_blocks(y.coeffs, y.bw, y.bh, g.bwp, g.bhp)
            plane = np.asarray(_y_byte_plane_dyn(
                jnp.asarray(yp), bwp=g.bwp, bhp=g.bhp, wp=g.wp, hp=g.hp))
        else:
            plane = np.asarray(_y_byte_plane(
                jnp.asarray(y.coeffs), bw=y.bw, bh=y.bh, w=w, h=h))
        gx = np.minimum(
            (np.tile(np.arange(cbw), cbh)[:, None] * 16
             + np.arange(16)[None, :]), w - 1)
        gy = np.minimum(
            (np.repeat(np.arange(cbh), cbw)[:, None] * 16
             + np.arange(16)[None, :]), h - 1)
        out = plane[gy[:, :, None], gx[:, None, :]]    # [NBc, 16, 16]
        if self.geom is not None:
            g = self.geom
            out = g.pad_blocks(out.reshape(cbw * cbh, -1), cbw, cbh,
                               g.wp // 16, g.hp // 16) \
                .reshape(-1, 16, 16)
        return self._put_blocks(out)

    def children_state(self, cbw, cbh):
        """Gather the full-res block-grid state into [NBc, 2, 2, ...] for
        the 2x2 children of each 16x16 macroblock, plus a validity mask.
        Padded mode: the macroblock axis is the bucket chroma grid and the
        child gather strides over the bucket block grid."""
        xyb0_tiles, scales, ysel, xsel = self.block_state(1, 1)
        w, h = self.width, self.height
        bw, bh = (w + 7) // 8, (h + 7) // 8
        if self.geom is not None:
            gm = self.geom
            gcbw, gcbh, stride = gm.wp // 16, gm.hp // 16, gm.bwp
        else:
            gcbw, gcbh, stride = cbw, cbh, bw
        cbx = np.tile(np.arange(gcbw), gcbh)
        cby = np.repeat(np.arange(gcbh), gcbw)
        ix = np.arange(2)
        child_x = cbx[:, None, None] * 2 + ix[None, None, :]   # [NBc,1,2]
        child_y = cby[:, None, None] * 2 + ix[None, :, None]   # [NBc,2,1]
        valid = (child_x < bw) & (child_y < bh)                # [NBc,2,2]
        idx = np.where(valid,
                       child_y * stride + child_x, 0).reshape(-1)
        nbc = gcbw * gcbh

        def g(a):
            return self._put_blocks(np.asarray(a)[idx].reshape(
                (nbc, 2, 2) + np.asarray(a).shape[1:]))

        return (g(xyb0_tiles), g(scales), g(ysel), g(xsel),
                self._put_blocks(valid))

    def distance_ok(self, target_mul):
        return self.distance <= target_mul * self.target_distance

    def score_output_size(self, size):
        return score_jpeg(self.distance, size, self.target_distance)

    def block_error_limit(self):
        return self.target_distance

    # -- per-block comparison state -------------------------------------

    def start_block_comparisons(self):
        if self.geom is not None:
            self._mask_xyz = _whole_image_mask_dyn(self.xyb0, *self._wh,
                                                   self._sc)
        else:
            self._mask_xyz = _whole_image_mask(self.xyb0)

    def finish_block_comparisons(self):
        self._mask_xyz = None
        self._block_state = {}

    def block_state(self, factor_x, factor_y):
        """(xyb0_tiles, scales, ysel, xsel) for the sub-block grid.

        The grid enumerates the 8x8 *pixel* blocks of the full-resolution
        image (block_x in [0, ceil(w/8)), row-major), i.e. the blocks that
        CompareBlock evaluates; for factor 2 each coefficient macroblock
        covers 2x2 of these.
        """
        key = (factor_x, factor_y)
        if key not in self._block_state:
            assert self._mask_xyz is not None, "start_block_comparisons first"
            w, h = self.width, self.height
            bw = (w + 7) // 8
            bh = (h + 7) // 8
            xyb0_tiles = tile_ops.original_opsin_tiles(
                self.rgb_orig, w, h, bw, bh)
            bx = np.tile(np.arange(bw), bh)
            by = np.repeat(np.arange(bh), bw)
            # Gather the per-block corner scales ON DEVICE: pulling the
            # whole [3, Hp, Wp] mask to slice NB pixels shipped ~95 MB
            # over the ~13 MB/s device->host link at 8 MPix for a
            # ~1.5 MB result.
            scales = np.asarray(_gather_block_scales(
                self._mask_xyz, jnp.asarray(8 * by), jnp.asarray(8 * bx))
            ).astype(np.float32)                                 # [NB, 3]
            ysel, xsel = tile_ops.edge_gather_indices(bw, bh, w, h)
            if self.geom is not None:
                # Pad the block axis to the bucket grid so the per-block
                # compare and zeroing programs are bucket-shaped too.
                g = self.geom
                nbp = g.bwp * g.bhp

                def padb(a):
                    a = np.asarray(a)
                    flat = a.reshape(a.shape[0], -1)
                    out = g.pad_blocks(flat, bw, bh, g.bwp, g.bhp)
                    return out.reshape((nbp,) + a.shape[1:])

                # The opsin tiles live on device (opsin_dynamics_blocks
                # output); pad them with a DEVICE gather -- the numpy
                # padb would pull ~[NB, 3, 64] floats over the tunnel's
                # slow direction (~1.1 s at 1 MPix) just to zero-extend
                # the block axis. Mesh encodes keep the host path
                # (_put_blocks shards from numpy).
                if self.mesh is None:
                    r = np.arange(nbp, dtype=np.int64)
                    ry, rx = r // g.bwp, r % g.bwp
                    vrow = (ry < bh) & (rx < bw)
                    src = np.where(vrow, ry * bw + rx, 0).astype(np.int32)
                    xyb0_tiles = _pad_rows_dev(
                        jnp.asarray(xyb0_tiles), jnp.asarray(src),
                        jnp.asarray(vrow))
                else:
                    xyb0_tiles = padb(xyb0_tiles)
                scales = padb(scales)
                ysel = padb(ysel)
                xsel = padb(xsel)
            self._block_state[key] = (
                self._put_blocks(xyb0_tiles),
                self._put_blocks(scales),
                self._put_blocks(ysel),
                self._put_blocks(xsel),
            )
        return self._block_state[key]

    def compare_block_batch(self, cand_coeffs, factor_x=1, factor_y=1):
        """Errors [NB] for candidate coefficient tiles [NB, 3, 64] (int32,
        dequantized), NB = ceil(h/8)*ceil(w/8) in row-major order."""
        xyb0_tiles, scales, ysel, xsel = self.block_state(factor_x, factor_y)
        return _compare_block_batch(cand_coeffs, xyb0_tiles, scales,
                                    ysel, xsel)

    # -- block error adjustment weights ---------------------------------

    def _grid_dims(self, factor_x, factor_y):
        sizex, sizey = 8 * factor_x, 8 * factor_y
        gbw = (self.width + sizex - 1) // sizex
        gbh = (self.height + sizey - 1) // sizey
        return sizex, sizey, gbw, gbh

    def _unpad_w4(self, w4_np, factor_x, factor_y):
        """[4, GBHp*GBWp] padded weight grid -> [4, gbh*gbw] real grid."""
        g = self.geom
        _, _, gbw, gbh = self._grid_dims(factor_x, factor_y)
        return g.unpad_grid(w4_np, gbw, gbh,
                            g.wp // (8 * factor_x), g.hp // (8 * factor_y))

    def weights_all_radii(self, direction, target_mul, factor_x, factor_y):
        """[4, NB] weights for rblock radii 1..4 from the device-resident
        distmap of the last compare (single small pull)."""
        sizex, sizey, gbw, gbh = self._grid_dims(factor_x, factor_y)
        if self.geom is not None:
            g = self.geom
            out = _weights_all_radii(
                self.distmap,
                jnp.float32(self.target_distance * target_mul),
                sizex=sizex, sizey=sizey,
                bw=g.wp // sizex, bh=g.hp // sizey,
                direction_pos=direction > 0)
            return self._unpad_w4(np.asarray(out), factor_x, factor_y)
        out = _weights_all_radii(
            self.distmap, jnp.float32(self.target_distance * target_mul),
            sizex=sizex, sizey=sizey, bw=gbw, bh=gbh,
            direction_pos=direction > 0)
        return np.asarray(out)

    def dispatch_compare_with_weights(self, img, direction, target_mul,
                                      factor_x, factor_y):
        """Asynchronously dispatch the fused compare + next-iteration block
        weights; returns a handle for fetch_compare(). Lets the caller
        overlap host-side serialization with the device round trip."""
        sizex, sizey, gbw, gbh = self._grid_dims(factor_x, factor_y)
        tgt = jnp.float32(self.target_distance * target_mul)
        if self.geom is not None:
            g = self.geom
            if img.is_444():
                cp = g.pad_blocks(img.coeffs, img.bw, img.bh,
                                  g.bwp, g.bhp)
                statics = dict(
                    bwp=g.bwp, bhp=g.bhp, wp=g.wp, hp=g.hp,
                    sizex=sizex, sizey=sizey,
                    gbwp=g.wp // sizex, gbhp=g.hp // sizey,
                    direction_pos=direction > 0)
                if self.batcher is not None:
                    idx = self.batcher.enqueue(
                        "444", tuple(sorted(statics.items())),
                        (jnp.asarray(cp), self.xyb0, tgt, *self._wh,
                         self._sc))
                    return ("batch", idx, (factor_x, factor_y))
                score, dmap, w4 = _compare_weights_444_dyn(
                    self._put_blocks(cp, axis=1), self.xyb0, tgt,
                    *self._wh, self._sc, **statics)
            else:
                y, u, v = img.comps
                yp = g.pad_blocks(y.coeffs, y.bw, y.bh, g.bwp, g.bhp)
                cbwp, cbhp = g.wp // 16, g.hp // 16
                up = g.pad_blocks(u.coeffs, u.bw, u.bh, cbwp, cbhp)
                vp = g.pad_blocks(v.coeffs, v.bw, v.bh, cbwp, cbhp)
                statics = dict(
                    ybwp=g.bwp, ybhp=g.bhp, cbwp=cbwp, cbhp=cbhp,
                    wp=g.wp, hp=g.hp, sizex=sizex, sizey=sizey,
                    gbwp=g.wp // sizex, gbhp=g.hp // sizey,
                    direction_pos=direction > 0)
                if self.batcher is not None:
                    idx = self.batcher.enqueue(
                        "420", tuple(sorted(statics.items())),
                        (jnp.asarray(yp), jnp.asarray(up),
                         jnp.asarray(vp), self.xyb0, tgt, *self._wh,
                         self._sc))
                    return ("batch", idx, (factor_x, factor_y))
                score, dmap, w4 = _compare_weights_420_dyn(
                    self._put_blocks(yp), self._put_blocks(up),
                    self._put_blocks(vp),
                    self.xyb0, tgt, *self._wh, self._sc, **statics)
            return (score, dmap, w4, (factor_x, factor_y))
        if img.is_444():
            score, dmap, w4 = _compare_weights_444(
                jnp.asarray(img.coeffs), self.xyb0, tgt,
                bw=img.bw, bh=img.bh, w=self.width, h=self.height,
                sizex=sizex, sizey=sizey, gbw=gbw, gbh=gbh,
                direction_pos=direction > 0)
        else:
            y, u, v = img.comps
            score, dmap, w4 = _compare_weights_420(
                jnp.asarray(y.coeffs), jnp.asarray(u.coeffs),
                jnp.asarray(v.coeffs), self.xyb0, tgt,
                ybw=y.bw, ybh=y.bh, cbw=u.bw, cbh=u.bh,
                w=self.width, h=self.height,
                sizex=sizex, sizey=sizey, gbw=gbw, gbh=gbh,
                direction_pos=direction > 0)
        return (score, dmap, w4, None)

    def fetch_compare(self, handle):
        """Complete a dispatch_compare_with_weights round trip."""
        if isinstance(handle[0], str):
            score, dmap, w4_np = self.batcher.result(handle[1])
            self.distance = score
            self.distmap = dmap
            return self.distance, self._unpad_w4(w4_np, *handle[2])
        d, w4_np, dmap = self.fetch_compare_pure(handle)
        self.distance = d
        self.distmap = dmap
        return d, w4_np

    def fetch_compare_pure(self, handle):
        """fetch_compare without comparator side effects: safe to call
        from a prefetch thread (the pipelined back-end driver applies the
        distance/distmap updates on the main thread at its deterministic
        join point). Returns (distance, weights4, device_distmap)."""
        score, dmap, w4, factors = handle
        score_np, w4_np = jax.device_get((score, w4))
        w4_np = np.asarray(w4_np)
        if factors is not None:
            w4_np = self._unpad_w4(w4_np, *factors)
        return float(score_np), w4_np, dmap

    def compare_img_with_weights(self, img, direction, target_mul,
                                 factor_x, factor_y):
        """Fused compare + next-iteration block weights: one device
        dispatch, one pull of (score, [4, NB])."""
        return self.fetch_compare(self.dispatch_compare_with_weights(
            img, direction, target_mul, factor_x, factor_y))

    def compute_block_error_adjustment_weights(
            self, direction, max_block_dist, target_mul, factor_x, factor_y,
            distmap):
        """butteraugli_comparator.cc:169-233, vectorized in numpy."""
        target = self.target_distance * target_mul
        w, h = self.width, self.height
        sizex, sizey = 8 * factor_x, 8 * factor_y
        bw = (w + sizex - 1) // sizex
        bh = (h + sizey - 1) // sizey
        d = np.asarray(distmap, dtype=np.float32).reshape(h, w)
        pad = np.zeros((bh * sizey, bw * sizex), dtype=np.float32)
        pad[:h, :w] = d
        max_dist = pad.reshape(bh, sizey, bw, sizex).max(axis=(1, 3))

        r = max_block_dist
        local = max_dist
        for _ in range(r):
            p = np.pad(local, 1, mode='edge')
            local = np.maximum.reduce([
                p[0:-2, 0:-2], p[0:-2, 1:-1], p[0:-2, 2:],
                p[1:-1, 0:-2], p[1:-1, 1:-1], p[1:-1, 2:],
                p[2:, 0:-2], p[2:, 1:-1], p[2:, 2:]])
        max_local = np.maximum(local, target)

        weight = np.zeros((bh, bw), dtype=np.float32)
        if direction > 0:
            ok = (max_dist <= target) & (max_local <= 1.1 * target)
            weight[ok] = 1.0
        else:
            k_local_max_weight = 0.5
            src = max_dist > ((1 - k_local_max_weight) * target
                              + k_local_max_weight * max_local)
            # weight[ix] = 1/(dmin+1), dmin = Chebyshev distance to the
            # nearest src block within radius r.
            reach = src.copy()
            for dist in range(r + 1):
                contrib = np.float32(1.0 / (dist + 1.0))
                weight = np.maximum(weight, np.where(reach, contrib, 0.0))
                if dist < r:
                    p = np.pad(reach, 1, mode='constant')
                    reach = (p[0:-2, 0:-2] | p[0:-2, 1:-1] | p[0:-2, 2:]
                             | p[1:-1, 0:-2] | p[1:-1, 1:-1] | p[1:-1, 2:]
                             | p[2:, 0:-2] | p[2:, 1:-1] | p[2:, 2:])
        return weight.reshape(-1)


@jax.jit
def _pad_rows_dev(a, src, valid):
    """Zero-padded row gather: out[r] = a[src[r]] where valid[r] else 0
    (the device form of PadGeometry.pad_blocks on the leading axis)."""
    out = a[src]
    shape = (-1,) + (1,) * (a.ndim - 1)
    return jnp.where(valid.reshape(shape), out, jnp.zeros_like(out))


@jax.jit
def _gather_block_scales(mask_xyz, ys, xs):
    """mask_xyz [3, H, W] -> [NB, 3] values at (ys, xs) per block."""
    return mask_xyz[:, ys, xs].T


def fetch_compare_many(comps, handles):
    """Complete many dispatch_compare_with_weights / dispatch_compare_sparse
    round trips in ONE combined device pull.

    The lockstep corpus back-end previously paid a full tunnel round trip
    per image per iteration; pulling every active image's (score, w4) in
    one device_get makes each back-end round cost one RTT regardless of
    corpus width. Batcher handles resolve through their batcher (itself
    one pull per flush group). Per-comparator side effects (distance,
    device-resident distmap) match fetch_compare exactly."""
    out = [None] * len(handles)
    direct = [(i, h) for i, h in enumerate(handles)
              if not isinstance(h[0], str)]
    if direct:
        pulled = jax.device_get([(h[0], h[2]) for _i, h in direct])
        for (i, h), (score_np, w4_np) in zip(direct, pulled):
            c = comps[i]
            c.distance = float(score_np)
            c.distmap = h[1]
            w4 = np.asarray(w4_np)
            if h[3] is not None:
                w4 = c._unpad_w4(w4, *h[3])
            out[i] = (c.distance, w4)
    for i, h in enumerate(handles):
        if isinstance(h[0], str):
            out[i] = comps[i].fetch_compare(h)
    return out
