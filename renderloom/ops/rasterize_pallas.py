"""Fused Pallas rasterization kernel for TPU.

The jnp rasterizers (``renderloom.ops.rasterize``) materialize per-element
distance fields — (E, H, W) intermediates for 19 gaussians, 18 skeleton
capsules and 39 mask capsules — that each round-trip HBM unless XLA fuses
them perfectly.  This kernel computes the entire per-frame label stack in
one pass over pixel tiles held in VMEM: for each (row-tile × W) block it
unrolls the element loops in registers and writes each output exactly
once.  Grid = (frames, row-tiles); parameters (joint/edge tables) are tiny
per-frame arrays.

Semantics are bit-compatible with the jnp path (same formulas, same
validity gating) — ``tests/test_rasterize_pallas.py`` asserts equality —
so ``rasterize_frames_fused`` transparently falls back to the jnp
implementation on non-TPU backends (pallas interpret mode is used in
tests).

Reference provenance is the same as ``rasterize.py``:
``Pose_Guided_Neural_Rendering/datasets/HSM_auto_dataset.py:205-334`` and
``utils/keypoint2img.py:47-148``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from renderloom.ops import rasterize as R

J = 19
E_SKEL = R.POSE_EDGES_19.shape[0]          # 18
E_MASK = R.MASK_EDGES.shape[0]             # 20


def _build_tables(coords, conf, sigma, keep_joints, keep_edges,
                  part_keep, height, width, thres, foot_thres):
    """Per-frame parameter tables for the kernel (all shapes static).

    Returns
      joints: (J, 4)  = x_floor, y_floor, inv_2s2, heat_valid
      skel:   (E_SKEL, 8) = ax, ay, bx, by, valid, r, g, b
      caps:   (J + E_MASK, 7) = ax, ay, bx, by, radius, valid, part
    """
    x, y = coords[:, 0], coords[:, 1]
    inb = (x >= 0) & (y >= 0) & (x < width) & (y < height)

    heat_valid = inb & (conf > thres)
    if keep_joints is not None:
        heat_valid = heat_valid & keep_joints
    joints = jnp.stack([jnp.floor(x), jnp.floor(y),
                        1.0 / (2.0 * sigma * sigma),
                        heat_valid.astype(jnp.float32)], axis=1)

    # skeleton edges: per-joint foot thresholds, un-floored coords
    valid = R.valid_joints(coords, conf, height, width, thres, foot_thres)
    safe = jnp.where(valid[:, None], coords, 0.0)
    edges = jnp.asarray(R.POSE_EDGES_19)
    a = safe[edges[:, 0]]
    b = safe[edges[:, 1]]
    e_ok = valid[edges[:, 0]] & valid[edges[:, 1]]
    if keep_edges is not None:
        e_ok = e_ok & keep_edges
    colors = jnp.asarray(R.POSE_COLORS_19) / 255.0
    skel = jnp.concatenate([a, b, e_ok.astype(jnp.float32)[:, None],
                            colors], axis=1)

    # mask capsules: joint disks (zero-length) + limb segments, floored
    mvalid = inb & (conf > thres)
    xi, yi = jnp.floor(x), jnp.floor(y)
    pt = jnp.stack([xi, yi], axis=1)
    disk = jnp.concatenate([
        pt, pt, jnp.asarray(R.MASK_JOINT_RADII)[:, None],
        mvalid.astype(jnp.float32)[:, None],
        jnp.zeros((J, 1))], axis=1)
    medges = jnp.asarray(R.MASK_EDGES)
    ma = pt[medges[:, 0]]
    mb = pt[medges[:, 1]]
    m_ok = mvalid[medges[:, 0]] & mvalid[medges[:, 1]]
    part = part_keep if part_keep is not None \
        else jnp.zeros((E_MASK,), bool)
    seg = jnp.concatenate([
        ma, mb, jnp.asarray(R.MASK_EDGE_RADII)[:, None],
        m_ok.astype(jnp.float32)[:, None],
        part.astype(jnp.float32)[:, None]], axis=1)
    caps = jnp.concatenate([disk, seg], axis=0)
    return joints, skel, caps


def _grids(shape, h0, scale: int = 1, oy: int = 0, ox: int = 0):
    """Full-res (ys, xs) pixel grids for a block of ``shape`` whose row
    0 sits at full-res row ``h0``.  ``scale``/``oy``/``ox`` map a
    parity-packed block to its full-res coordinates (packed index i →
    full-res 2i+parity).  TPU iota must be integer-typed; cast after
    (Mosaic rejects f32 iota)."""
    ys = jax.lax.broadcasted_iota(jnp.int32, shape, 0
                                  ).astype(jnp.float32) * scale + oy + h0
    xs = jax.lax.broadcasted_iota(jnp.int32, shape, 1
                                  ).astype(jnp.float32) * scale + ox
    return ys, xs


def _seg_dist2(xs, ys, ax, ay, bx, by):
    # SQUARED capsule distance: every use compares against a
    # non-negative radius, so d <= r runs as d^2 <= r^2 — saves a
    # VPU sqrt per capsule per pixel (57 sqrts/px at 320x480)
    dx, dy = bx - ax, by - ay
    len2 = dx * dx + dy * dy
    t = ((xs - ax) * dx + (ys - ay) * dy) / jnp.maximum(len2, 1e-6)
    t = jnp.clip(t, 0.0, 1.0)
    cx, cy = ax + t * dx, ay + t * dy
    return (xs - cx) ** 2 + (ys - cy) ** 2


def _skel_tiles(xs, ys, skel_ref, brush: float):
    """Skeleton color image: color-averaged capsule coverage → 3 tiles
    (coverage-colored, range [0, 1])."""
    zeros = jnp.zeros(xs.shape, jnp.float32)
    racc, gacc, bacc, cnt = zeros, zeros, zeros, zeros
    for e in range(E_SKEL):
        ax, ay = skel_ref[0, e, 0], skel_ref[0, e, 1]
        bx, by = skel_ref[0, e, 2], skel_ref[0, e, 3]
        valid = skel_ref[0, e, 4]
        d2 = _seg_dist2(xs, ys, ax, ay, bx, by)
        da2 = (xs - ax) ** 2 + (ys - ay) ** 2
        db2 = (xs - bx) ** 2 + (ys - by) ** 2
        cover = jnp.where(
            (d2 <= brush * brush) | (da2 <= (2 * brush) ** 2)
            | (db2 <= (2 * brush) ** 2), valid, 0.0)
        racc = racc + cover * skel_ref[0, e, 5]
        gacc = gacc + cover * skel_ref[0, e, 6]
        bacc = bacc + cover * skel_ref[0, e, 7]
        cnt = cnt + cover
    denom = jnp.maximum(cnt, 1.0)
    return [racc / denom, gacc / denom, bacc / denom]


def _heat_tiles(xs, ys, joints_ref):
    """One gaussian heatmap tile per joint (19 tiles)."""
    tiles = []
    for j in range(J):
        x = joints_ref[0, j, 0]
        y = joints_ref[0, j, 1]
        inv2s2 = joints_ref[0, j, 2]
        valid = joints_ref[0, j, 3]
        d2 = (xs - x) ** 2 + (ys - y) ** 2
        tiles.append(jnp.exp(-d2 * inv2s2) * valid)
    return tiles


def _mask_tiles(xs, ys, caps_ref):
    """Human mask + part mask: union of capsule coverages."""
    zeros = jnp.zeros(xs.shape, jnp.float32)
    macc, pacc = zeros, zeros
    for c in range(J + E_MASK):
        ax, ay = caps_ref[0, c, 0], caps_ref[0, c, 1]
        bx, by = caps_ref[0, c, 2], caps_ref[0, c, 3]
        radius = caps_ref[0, c, 4]
        valid = caps_ref[0, c, 5]
        is_part = caps_ref[0, c, 6]
        d2 = _seg_dist2(xs, ys, ax, ay, bx, by)
        cover = jnp.where(d2 <= radius * radius, valid, 0.0)
        macc = jnp.maximum(macc, cover)
        pacc = jnp.maximum(pacc, cover * is_part)
    return macc, pacc


def _kernel(joints_ref, skel_ref, caps_ref, heat_ref, skimg_ref,
            mask_ref, part_ref, *, tile_h: int, width: int,
            brush: float):
    """Channel-major layout: heatmaps (F,19,H,W) + skeleton (F,3,H,W)."""
    h0 = (pl.program_id(1) * tile_h).astype(jnp.float32)
    ys, xs = _grids((tile_h, width), h0)
    odt = heat_ref.dtype                     # label stream dtype (f32 or
    for j, t in enumerate(_heat_tiles(xs, ys, joints_ref)):
        heat_ref[0, j] = t.astype(odt)       # bf16: halves the write
    for c, t in enumerate(_skel_tiles(xs, ys, skel_ref, brush)):
        skimg_ref[0, c] = t.astype(odt)
    macc, pacc = _mask_tiles(xs, ys, caps_ref)
    mask_ref[0] = macc
    part_ref[0] = pacc


def _label_tiles(xs, ys, joints_ref, skel_ref, brush: float):
    """The final 22ch label at these pixels: 3ch skeleton scaled to
    [-1, 1] + 19ch heatmaps (data/hsm.py label assembly order,
    trainer.py:152 semantics)."""
    skel = [t * 2.0 - 1.0 for t in _skel_tiles(xs, ys, skel_ref, brush)]
    return skel + _heat_tiles(xs, ys, joints_ref)


def _kernel_cmaj(joints_ref, skel_ref, caps_ref, label_ref,
                 mask_ref=None, part_ref=None, *, tile_h: int,
                 width: int, brush: float):
    """Assembled 22ch label in CHANNEL-MAJOR (F,22,H,W) — the
    Mosaic-friendly emission: each channel is one clean
    (sublane,lane)=(tile_h,width) store.  Writing the label
    channel-LAST from the kernel instead (``_kernel_nhwc`` /
    ``_kernel_packed`` below) forces a per-channel lane relayout that
    the v5e register allocator spills catastrophically — measured
    153 MB of spill slots against the 128 MB VMEM cap (queue3
    2026-08-19T08:24Z), and 20-40 min remote compiles where it fit.
    The wrapper converts to the consumer layout with ONE XLA transpose
    (~0.5 ms HBM round-trip of the label stream) instead.
    ``mask_ref is None`` (inference serving): the 39 mask capsules —
    over half the kernel's per-pixel work — are never evaluated."""
    h0 = (pl.program_id(1) * tile_h).astype(jnp.float32)
    ys, xs = _grids((tile_h, width), h0)
    for c, t in enumerate(_label_tiles(xs, ys, joints_ref, skel_ref,
                                       brush)):
        label_ref[0, c] = t.astype(label_ref.dtype)
    if mask_ref is not None:
        macc, pacc = _mask_tiles(xs, ys, caps_ref)
        mask_ref[0] = macc
        part_ref[0] = pacc


def _kernel_nhwc(joints_ref, skel_ref, caps_ref, label_ref,
                 mask_ref=None, part_ref=None, *, tile_h: int,
                 width: int, brush: float):
    """NHWC layout, label written channel-last directly from the
    kernel.  RENDERLOOM_RASTER_LANE_EMIT=1 only: on current Mosaic the
    channel-minor stores spill registers past VMEM (see
    ``_kernel_cmaj``); kept for re-evaluation on newer toolchains."""
    h0 = (pl.program_id(1) * tile_h).astype(jnp.float32)
    ys, xs = _grids((tile_h, width), h0)
    tiles = _label_tiles(xs, ys, joints_ref, skel_ref, brush)
    label_ref[0] = jnp.stack(tiles, axis=-1).astype(label_ref.dtype)
    if mask_ref is not None:
        macc, pacc = _mask_tiles(xs, ys, caps_ref)
        mask_ref[0] = macc
        part_ref[0] = pacc


def _kernel_packed(joints_ref, skel_ref, caps_ref, label_ref,
                   mask_ref=None, part_ref=None, *, tile_h: int,
                   width: int, brush: float):
    """Parity-packed layout: label (F,H/2,W/2,88) with channel index
    (row_parity·2 + col_parity)·22 + c — exactly
    ``fastpath.space_to_depth`` of the NHWC label, so the parity-layout
    fast path never pays a space-to-depth on its input.  The masks stay
    full-res.  Same per-pixel work: each full-res pixel is computed in
    exactly one parity tile.  RENDERLOOM_RASTER_LANE_EMIT=1 only — the
    88-channel-minor store spills registers past VMEM on current
    Mosaic (see ``_kernel_cmaj``)."""
    th_p, w_p = tile_h // 2, width // 2
    h0 = (pl.program_id(1) * tile_h).astype(jnp.float32)
    tiles = []
    for a in (0, 1):
        for b in (0, 1):
            ys, xs = _grids((th_p, w_p), h0, scale=2, oy=a, ox=b)
            tiles += _label_tiles(xs, ys, joints_ref, skel_ref, brush)
    label_ref[0] = jnp.stack(tiles, axis=-1).astype(label_ref.dtype)
    if mask_ref is not None:
        ysf, xsf = _grids((tile_h, width), h0)
        macc, pacc = _mask_tiles(xsf, ysf, caps_ref)
        mask_ref[0] = macc
        part_ref[0] = pacc


def rasterize_frames_fused(key: Optional[jax.Array], coords: jax.Array,
                           conf: jax.Array, height: int, width: int,
                           gauss_sigma: float = 5.0,
                           random_drop_prob: float = 0.02,
                           random_blur_rate: float = 0.06,
                           thres: float = 0.001,
                           foot_thres: float = 0.001,
                           train: bool = True,
                           tile_h: Optional[int] = None,
                           interpret: bool = False,
                           out_dtype=jnp.float32,
                           layout: str = "cfhw",
                           emit_masks: bool = True):
    """Pallas-fused equivalent of :func:`rasterize.rasterize_frames`.

    coords (F, J, 2), conf (F, J) → dict; ``layout`` picks the label
    output form (masks are (F,H,W) f32 0/1 — ``emit_masks=False``
    drops them AND their 39 capsule evaluations per pixel, the right
    call for serving where only the label is consumed):

    * ``"cfhw"``  — heatmaps (F,19,H,W) + skeleton (F,3,H,W) coverage
      colors in [0,1], both ``out_dtype`` (the rasterize.py-compatible
      form);
    * ``"nhwc"``  — the assembled label (F,H,W,22): skeleton scaled to
      [-1,1] + heatmaps, written once in the consumer layout;
    * ``"packed"`` — label (F,H/2,W/2,88) = space_to_depth of the NHWC
      label for the parity fast path (fastpath.py); H, W must be even.

    ``out_dtype=bf16`` halves the dominant label-stream write on TPU.
    """
    F = coords.shape[0]
    if tile_h is None:
        # hardware-tunable without code edits (the TPU sweep A/Bs it);
        # 64 rows x 480 px x 22ch fits VMEM with headroom at any layout
        import os
        tile_h = int(os.environ.get("RENDERLOOM_RASTER_TILE_H", "64"))
    if layout == "packed":
        assert height % 2 == 0 and width % 2 == 0, (height, width)
        if tile_h % 2:
            tile_h += 1
    if height % tile_h != 0:
        tile_h = height          # fall back to one tile per frame
    # compiled pallas needs a TPU target; elsewhere run the interpreter
    # (target, not backend: cross-host export must not bake interpret
    # mode into a TPU artifact — ops.target_is_tpu)
    from renderloom.ops import target_is_tpu
    interpret = interpret or not target_is_tpu()

    def tables_one(k, c, cf):
        if train and k is not None:
            k_sig, k_drop, k_edge, k_blur = jax.random.split(k, 4)
            sigma = jax.random.randint(
                k_sig, (J,), int(gauss_sigma) - 1,
                int(gauss_sigma) + 1).astype(jnp.float32)
            keep_j = jax.random.uniform(k_drop, (J,)) > random_drop_prob
            keep_e = jax.random.uniform(k_edge, (E_SKEL,)) \
                > random_drop_prob
            part = jax.random.uniform(k_blur, (E_MASK,)) \
                < random_blur_rate
        else:
            sigma = jnp.full((J,), gauss_sigma, jnp.float32)
            keep_j = keep_e = part = None
        return _build_tables(c, cf, sigma, keep_j, keep_e, part, height,
                             width, thres, foot_thres)

    if train and key is not None:
        keys = jax.random.split(key, F)
        joints, skel, caps = jax.vmap(tables_one)(keys, coords, conf)
    else:
        joints, skel, caps = jax.vmap(
            lambda c, cf: tables_one(None, c, cf))(coords, conf)

    n_tiles = height // tile_h
    grid = (F, n_tiles)
    param_spec = lambda rows, cols: pl.BlockSpec(
        (1, rows, cols), lambda f, t: (f, 0, 0),
        memory_space=pltpu.VMEM)
    assert emit_masks or layout != "cfhw", \
        "cfhw is the rasterize.py-compatible form; masks are part of it"
    mask_specs = [
        pl.BlockSpec((1, tile_h, width), lambda f, t: (f, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_h, width), lambda f, t: (f, t, 0),
                     memory_space=pltpu.VMEM),
    ] if emit_masks else []
    mask_shapes = [
        jax.ShapeDtypeStruct((F, height, width), jnp.float32),
        jax.ShapeDtypeStruct((F, height, width), jnp.float32),
    ] if emit_masks else []
    # Channel-LAST emission straight from the kernel is opt-in: Mosaic
    # spills the lane-relayout stores past the 128 MB VMEM cap (packed:
    # 153 MB of register spill slots, queue3 2026-08-19T08:24Z) — the
    # default path emits channel-major and relayouts in XLA below.
    import os
    lane_emit = os.environ.get("RENDERLOOM_RASTER_LANE_EMIT") == "1"
    if layout == "cfhw":
        kfn = _kernel
        out_specs = [
            pl.BlockSpec((1, J, tile_h, width), lambda f, t: (f, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tile_h, width), lambda f, t: (f, 0, t, 0),
                         memory_space=pltpu.VMEM),
        ] + mask_specs
        out_shape = [
            jax.ShapeDtypeStruct((F, J, height, width), out_dtype),
            jax.ShapeDtypeStruct((F, 3, height, width), out_dtype),
        ] + mask_shapes
    elif layout in ("nhwc", "packed") and not lane_emit:
        kfn = _kernel_cmaj
        out_specs = [
            pl.BlockSpec((1, J + 3, tile_h, width),
                         lambda f, t: (f, 0, t, 0),
                         memory_space=pltpu.VMEM),
        ] + mask_specs
        out_shape = [
            jax.ShapeDtypeStruct((F, J + 3, height, width), out_dtype),
        ] + mask_shapes
    elif layout == "nhwc":
        kfn = _kernel_nhwc
        out_specs = [
            pl.BlockSpec((1, tile_h, width, J + 3),
                         lambda f, t: (f, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + mask_specs
        out_shape = [
            jax.ShapeDtypeStruct((F, height, width, J + 3), out_dtype),
        ] + mask_shapes
    elif layout == "packed":
        kfn = _kernel_packed
        out_specs = [
            pl.BlockSpec((1, tile_h // 2, width // 2, 4 * (J + 3)),
                         lambda f, t: (f, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + mask_specs
        out_shape = [
            jax.ShapeDtypeStruct(
                (F, height // 2, width // 2, 4 * (J + 3)), out_dtype),
        ] + mask_shapes
    else:
        raise ValueError(f"unknown layout {layout!r}")

    kernel = functools.partial(kfn, tile_h=tile_h, width=width,
                               brush=R.SKELETON_BRUSH)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[param_spec(J, 4), param_spec(E_SKEL, 8),
                  param_spec(J + E_MASK, 7)],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(joints, skel, caps)
    if layout == "cfhw":
        heat, skimg, mask, part = outs
        return {"heatmaps": heat, "skeleton": skimg, "mask": mask,
                "part_mask": part}
    label = outs[0]
    if kfn is _kernel_cmaj:
        # consumer relayout in XLA (one fused transpose, ~0.5 ms for
        # the 29-frame bf16 label stream — vs the VMEM-blowing lane
        # relayout inside the kernel)
        C = J + 3
        if layout == "nhwc":
            label = jnp.transpose(label, (0, 2, 3, 1))
        else:
            Fh, Hh, Wh = label.shape[0], height // 2, width // 2
            label = label.reshape(Fh, C, Hh, 2, Wh, 2)
            # packed channel = (row_parity*2 + col_parity)*C + c
            label = jnp.transpose(label, (0, 2, 4, 3, 5, 1)) \
                .reshape(Fh, Hh, Wh, 4 * C)
    if not emit_masks:
        return {"label": label}
    mask, part = outs[1], outs[2]
    return {"label": label, "mask": mask, "part_mask": part}
