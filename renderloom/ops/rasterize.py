"""On-device pose rasterization: heatmaps, colored skeleton, human masks.

TPU-native replacement for the reference's per-frame CPU rasterizers — the
input-pipeline hot spots flagged in SURVEY.md §3.3:

* 19-channel gaussian pose maps: scipy ``gaussian_filter`` over a one-hot
  (``Pose_Guided_Neural_Rendering/datasets/HSM_auto_dataset.py:205-236``)
  becomes the closed form ``exp(-d²/2σ²)`` over a coordinate grid;
* colored skeleton image: per-limb scipy ``curve_fit`` + pixel brush loops
  (``utils/keypoint2img.py:47-88,132-148``) become capsule
  (distance-to-segment) coverage fields — the reference's 14/18 limb
  chains all have exactly 2 joints, so its quadratic-fit path never
  triggers and every limb is a straight thick segment with endpoint dots;
  overlapping limb colors average, matching ``setColor``'s blend
  (``keypoint2img.py:36-45``);
* human dilation masks: cv2 thick lines + circles
  (``HSM_auto_dataset.py:254-334``) become unions of capsule/disk fields.

Everything is a pure jittable function of joint coordinates, vmappable
over frames and batches; pixel-exact parity with cv2 is *not* a goal
(renderloom trains its own renderer on its own rasterizer — SURVEY.md
§7.3), matching footprints and semantics is.

Layout note: maps are computed in (C, H, W) at float32.  H×W = 320×480
keeps the last dim a multiple of 128 ⇒ clean VPU lanes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Static skeleton topology (keypoint2img.py:150-173)
# ---------------------------------------------------------------------------

# 14 body edges + 4 extremity edges for the 19-joint layout
POSE_EDGES_19 = np.array([
    [0, 1], [1, 8],
    [1, 2], [2, 3], [3, 4],
    [1, 5], [5, 6], [6, 7],
    [8, 9], [9, 10], [10, 11],
    [8, 12], [12, 13], [13, 14],
    [4, 18], [7, 17], [11, 16], [14, 15],
], dtype=np.int32)

POSE_COLORS_19 = np.array([
    [153, 0, 51], [153, 0, 0],
    [153, 51, 0], [153, 102, 0], [153, 153, 0],
    [102, 153, 0], [51, 153, 0], [0, 153, 0],
    [0, 153, 51], [0, 153, 102], [0, 153, 153],
    [0, 102, 153], [0, 51, 153], [0, 0, 153],
    [208, 208, 0], [0, 208, 0], [0, 208, 208], [0, 0, 208],
], dtype=np.float32)

# joints that use the (lower) foot confidence threshold
# (keypoint2img.py:119)
FOOT_JOINTS = np.array([8, 9, 10, 11, 12, 13, 14, 15, 16], dtype=np.int32)

# human-mask limb groups with brush radii (HSM_auto_dataset.py:262-276:
# thickness 30 → radius 15, body thickness 40 → radius 20)
MASK_EDGES = np.array([
    [0, 1],                                              # head
    [1, 2], [2, 3], [3, 4], [1, 5], [5, 6], [6, 7],      # arms
    [8, 9], [9, 10], [10, 11], [8, 12], [12, 13], [13, 14],  # legs
    [4, 18], [7, 17],                                    # hands (19-joint)
    [11, 16], [14, 15],                                  # feet  (19-joint)
    [1, 8], [2, 9], [5, 12],                             # body
], dtype=np.int32)
MASK_EDGE_RADII = np.array([15.0] * 17 + [20.0] * 3, dtype=np.float32)
# per-joint disk radii (radius 15, head joint 0 radius 30)
MASK_JOINT_RADII = np.array([30.0] + [15.0] * 18, dtype=np.float32)

SKELETON_BRUSH = 4.0          # drawEdge bw=4 (HSM_auto_dataset.py:251)


def _grid(height: int, width: int) -> Tuple[jax.Array, jax.Array]:
    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    return ys[:, None], xs[None, :]          # broadcastable (H,1), (1,W)


def valid_joints(coords: jax.Array, conf: jax.Array, height: int,
                 width: int, thres: float = 0.001,
                 foot_thres: float = 0.001) -> jax.Array:
    """(J,) bool: inside the frame and above the per-joint confidence
    threshold (extract_valid_keypoints, keypoint2img.py:114-130)."""
    J = coords.shape[0]
    thr = jnp.full((J,), thres, dtype=jnp.float32)
    thr = thr.at[jnp.asarray(FOOT_JOINTS)].set(foot_thres)
    x, y = coords[:, 0], coords[:, 1]
    return ((x >= 0) & (y >= 0) & (x < width) & (y < height)
            & (conf > thr))


# ---------------------------------------------------------------------------
# Gaussian heatmaps
# ---------------------------------------------------------------------------


def gaussian_heatmaps(coords: jax.Array, conf: jax.Array, height: int,
                      width: int, sigma: jax.Array,
                      keep: Optional[jax.Array] = None,
                      thres: float = 0.001) -> jax.Array:
    """(J, 2) xy + (J,) conf → (J, H, W) unit-peak gaussians.

    Closed form of HSM_auto_dataset.py:205-236: the reference drops a
    delta at the *integer* pixel and normalizes the filtered map by its
    max, which equals ``exp(-d²/2σ²)`` around ``(⌊x⌋, ⌊y⌋)``.  ``sigma``
    is per-joint ((J,) — the reference jitters it per joint at train
    time); ``keep`` is an optional (J,) bool for random joint dropout.
    """
    x = jnp.floor(coords[:, 0])
    y = jnp.floor(coords[:, 1])
    valid = ((coords[:, 0] >= 0) & (coords[:, 1] >= 0)
             & (coords[:, 0] < width) & (coords[:, 1] < height)
             & (conf > thres))
    if keep is not None:
        valid = valid & keep
    ys, xs = _grid(height, width)
    d2 = ((xs - x[:, None, None]) ** 2 + (ys - y[:, None, None]) ** 2)
    maps = jnp.exp(-d2 / (2.0 * sigma[:, None, None] ** 2))
    return maps * valid[:, None, None].astype(jnp.float32)


# ---------------------------------------------------------------------------
# Capsule (segment-distance) fields — shared by skeleton and masks
# ---------------------------------------------------------------------------


def _segment_dist2(px: jax.Array, py: jax.Array, a: jax.Array,
                   b: jax.Array) -> jax.Array:
    """SQUARED distance from each grid pixel to segments a→b — every
    consumer compares against a non-negative radius, so d ≤ r is tested
    as d² ≤ r² (saves a VPU sqrt per capsule per pixel; the TPU raster
    kernel does the same).

    a, b: (E, 2).  Returns (E, H, W).
    """
    ax, ay = a[:, 0, None, None], a[:, 1, None, None]
    bx, by = b[:, 0, None, None], b[:, 1, None, None]
    dx, dy = bx - ax, by - ay
    len2 = dx * dx + dy * dy
    t = ((px - ax) * dx + (py - ay) * dy) / jnp.maximum(len2, 1e-6)
    t = jnp.clip(t, 0.0, 1.0)
    cx = ax + t * dx
    cy = ay + t * dy
    return (px - cx) ** 2 + (py - cy) ** 2


def skeleton_image(coords: jax.Array, conf: jax.Array, height: int,
                   width: int, keep_edges: Optional[jax.Array] = None,
                   thres: float = 0.001, foot_thres: float = 0.001,
                   brush: float = SKELETON_BRUSH) -> jax.Array:
    """(J,2) xy + (J,) conf → (3, H, W) colored skeleton in [0, 1].

    Each limb is a thick straight segment (capsule radius ``brush``) with
    endpoint dots of radius ``2·brush`` (drawEdge's ``draw_end_points``,
    keypoint2img.py:57-64); overlapping limbs average their colors.
    ``keep_edges`` is an optional (E,) bool for the train-time random
    limb drop (connect_keypoints, keypoint2img.py:144).
    """
    edges = jnp.asarray(POSE_EDGES_19)
    colors = jnp.asarray(POSE_COLORS_19) / 255.0          # (E, 3)
    valid = valid_joints(coords, conf, height, width, thres, foot_thres)
    # invalid joints are zeroed like extract_valid_keypoints; an edge is
    # drawn only when both endpoints are valid ("0 not in x")
    safe = jnp.where(valid[:, None], coords, 0.0)
    a = safe[edges[:, 0]]
    b = safe[edges[:, 1]]
    edge_ok = valid[edges[:, 0]] & valid[edges[:, 1]]
    if keep_edges is not None:
        edge_ok = edge_ok & keep_edges

    ys, xs = _grid(height, width)
    d2_seg = _segment_dist2(xs, ys, a, b)                 # (E, H, W)
    d2_end_a = ((xs - a[:, 0, None, None]) ** 2
                + (ys - a[:, 1, None, None]) ** 2)
    d2_end_b = ((xs - b[:, 0, None, None]) ** 2
                + (ys - b[:, 1, None, None]) ** 2)
    cover = ((d2_seg <= brush * brush)
             | (d2_end_a <= (2 * brush) ** 2)
             | (d2_end_b <= (2 * brush) ** 2))
    cover = cover & edge_ok[:, None, None]
    cover_f = cover.astype(jnp.float32)

    n = jnp.sum(cover_f, axis=0)                          # (H, W)
    rgb = jnp.einsum("ehw,ec->chw", cover_f, colors)
    return rgb / jnp.maximum(n, 1.0)[None]


def human_masks(coords: jax.Array, conf: jax.Array, height: int,
                width: int, part_keep: Optional[jax.Array] = None,
                thres: float = 0.001) -> Tuple[jax.Array, jax.Array]:
    """(J,2) xy + (J,) conf → (mask, part_mask), both (H, W) bool.

    ``mask``: union of joint disks and limb capsules — the foreground
    dilation mask used for loss weighting (HSM_auto_dataset.py:254-334).
    ``part_mask``: union over the random limb subset ``part_keep`` (E,)
    — the blur-simulation mask (rate ``random_blur_rate``).
    """
    J = coords.shape[0]
    x, y = coords[:, 0], coords[:, 1]
    valid = ((x >= 0) & (y >= 0) & (x < width) & (y < height)
             & (conf > thres))
    xi = jnp.floor(x)
    yi = jnp.floor(y)
    safe = jnp.stack([xi, yi], axis=1)

    ys, xs = _grid(height, width)

    # joint disks
    d2_joint = ((xs - xi[:, None, None]) ** 2
                + (ys - yi[:, None, None]) ** 2)
    radii_j = jnp.asarray(MASK_JOINT_RADII)[:, None, None]
    disk = (d2_joint <= radii_j * radii_j)
    disk = disk & valid[:, None, None]
    mask = jnp.any(disk, axis=0)

    # limb capsules
    edges = jnp.asarray(MASK_EDGES)
    radii = jnp.asarray(MASK_EDGE_RADII)
    a = safe[edges[:, 0]]
    b = safe[edges[:, 1]]
    edge_ok = valid[edges[:, 0]] & valid[edges[:, 1]]
    d2_seg = _segment_dist2(xs, ys, a, b)
    r2 = (radii * radii)[:, None, None]
    capsule = (d2_seg <= r2) & edge_ok[:, None, None]
    mask = mask | jnp.any(capsule, axis=0)

    if part_keep is None:
        part_mask = jnp.zeros((height, width), dtype=bool)
    else:
        part_mask = jnp.any(capsule & part_keep[:, None, None], axis=0)
    return mask, part_mask


# ---------------------------------------------------------------------------
# Fused per-frame rasterization (label stack for the renderer)
# ---------------------------------------------------------------------------


def rasterize_frame(key: Optional[jax.Array], coords: jax.Array,
                    conf: jax.Array, height: int, width: int,
                    gauss_sigma: float = 5.0,
                    random_drop_prob: float = 0.02,
                    random_blur_rate: float = 0.06,
                    thres: float = 0.001, foot_thres: float = 0.001,
                    train: bool = True):
    """One frame's full label stack.

    Returns dict with ``heatmaps`` (19,H,W) in [0,1], ``skeleton``
    (3,H,W) in [0,1], ``mask``/``part_mask`` (H,W) bool.  ``key=None`` or
    ``train=False`` disables all randomness (eval path,
    HSM_auto_dataset.py:227-231).
    """
    J = coords.shape[0]
    E = POSE_EDGES_19.shape[0]
    EM = MASK_EDGES.shape[0]
    if train and key is not None:
        k_sig, k_drop, k_edge, k_blur = jax.random.split(key, 4)
        # randint(sigma-1, sigma+1) — two integer values
        sigma = jax.random.randint(k_sig, (J,), int(gauss_sigma) - 1,
                                   int(gauss_sigma) + 1).astype(jnp.float32)
        keep_j = jax.random.uniform(k_drop, (J,)) > random_drop_prob
        keep_e = jax.random.uniform(k_edge, (E,)) > random_drop_prob
        part_keep = jax.random.uniform(k_blur, (EM,)) < random_blur_rate
    else:
        sigma = jnp.full((J,), gauss_sigma, dtype=jnp.float32)
        keep_j = None
        keep_e = None
        part_keep = None

    heatmaps = gaussian_heatmaps(coords, conf, height, width, sigma,
                                 keep_j, thres)
    skeleton = skeleton_image(coords, conf, height, width, keep_e, thres,
                              foot_thres)
    mask, part_mask = human_masks(coords, conf, height, width, part_keep,
                                  thres)
    return {"heatmaps": heatmaps, "skeleton": skeleton, "mask": mask,
            "part_mask": part_mask}


def rasterize_frames(key: Optional[jax.Array], coords: jax.Array,
                     conf: jax.Array, height: int, width: int, **kw):
    """vmap over a leading frame axis: coords (F, J, 2), conf (F, J)."""
    if key is not None and kw.get("train", True):
        keys = jax.random.split(key, coords.shape[0])
    else:
        keys = None
    fn = lambda k, c, cf: rasterize_frame(k, c, cf, height, width, **kw)
    if keys is None:
        return jax.vmap(lambda c, cf: rasterize_frame(
            None, c, cf, height, width, **kw))(coords, conf)
    return jax.vmap(fn)(keys, coords, conf)
