"""Pose geometry as pure jnp functions.

TPU-native rebuild of the AMASS training-data synthesis math that the
reference runs per-sample in numpy inside DataLoader workers
(``Human_Motion_Modelling/datasets/AMASS_dataset.py:221-615``).  Every
function here is shape-static, jittable and vmappable, so the whole
synthesis (rotation → projection → remap → noise → localize → normalize →
masks → linear prior) runs batched on device — the host only slices raw 3D
joint windows out of the h5 file.

Canonical layout matches the reference: a motion clip is ``(J, D, L)``
(joints × coordinate-dim × time).  Batched variants just ``vmap`` these.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# SMPL-H 52-joint → 17 body joints of the 19-joint openpose-like layout
# (AMASS_dataset.py:387-398).  Rows 17/18 are the averaged hand clusters.
SMPL_TO_OPENPOSE17 = jnp.array(
    [15, 12, 17, 19, 21, 16, 18, 20, 0, 2, 5, 8, 1, 4, 7, 10, 11],
    dtype=jnp.int32)

ROOT_2D = 8   # openpose mid-hip row (AMASS_dataset.py:528-531)
ROOT_3D = 0

# joint groups used by the noise augmentation (AMASS_dataset.py:596-608)
NOISE_JOINTS = jnp.array([3, 4, 6, 7, 10, 11, 13, 14, 15, 16, 17, 18],
                         dtype=jnp.int32)
DROP_JOINTS = jnp.array([0, 3, 4, 6, 7, 10, 11, 13, 14, 15, 16, 17, 18],
                        dtype=jnp.int32)
RIGHT_LEG = jnp.array([9, 10, 11, 16], dtype=jnp.int32)
LEFT_LEG = jnp.array([12, 13, 14, 15], dtype=jnp.int32)


def joints_to_openpose(data: jax.Array) -> jax.Array:
    """SMPL-H (52, D, L) → openpose-like (19, D, L).

    Rows 0-16 are remapped body joints; rows 17/18 are the mean of the
    right/left hand joint clusters (AMASS_dataset.py:387-398).
    """
    body = data[SMPL_TO_OPENPOSE17]
    right_hand = jnp.mean(data[22:37], axis=0, keepdims=True)
    left_hand = jnp.mean(data[37:52], axis=0, keepdims=True)
    return jnp.concatenate([body, right_hand, left_hand], axis=0)


def centralize(data: jax.Array) -> jax.Array:
    """Subtract joint-0's temporal mean (AMASS_dataset.py:510-517)."""
    centers = jnp.mean(data[0], axis=-1, keepdims=True)  # (D, 1)
    return data - centers[None]


def body_basis(motion3d: jax.Array,
               angles: Optional[jax.Array] = None) -> jax.Array:
    """Body-aligned orthonormal-ish basis, optionally view-rotated.

    Mirrors ``get_change_of_basis`` (AMASS_dataset.py:335-385) including its
    acknowledged non-orthogonality quirk (the reference comments "bugs!!!"
    but ships it): horizontal axis from shoulder/hip joints, z fixed up,
    y = cross(h, z), x = cross(y, z).  ``angles`` is (3,) rotation around
    the x axis (Rodrigues) followed by a z rotation.
    """
    horizontal = (motion3d[17] - motion3d[16] + motion3d[2] - motion3d[1]) / 2
    horizontal = jnp.mean(horizontal, axis=-1)
    horizontal = horizontal / jnp.linalg.norm(horizontal)
    local_z = jnp.array([0.0, 0.0, 1.0], dtype=motion3d.dtype)
    local_y = jnp.cross(horizontal, local_z)
    local_y = local_y / jnp.linalg.norm(local_y)
    local_x = jnp.cross(local_y, local_z)
    local = jnp.stack([local_x, local_y, local_z], axis=0)

    if angles is None:
        return local

    cx, cy, cz = jnp.cos(angles[0]), jnp.cos(angles[1]), jnp.cos(angles[2])
    sx, sz = jnp.sin(angles[0]), jnp.sin(angles[2])
    del cy  # the reference rotates around x then z only
    x = local[0]
    x_cpm = jnp.array([
        [0.0, 0.0, 0.0],
        [0.0, 0.0, 0.0],
        [0.0, 0.0, 0.0],
    ], dtype=motion3d.dtype)
    x_cpm = x_cpm.at[0, 1].set(-x[2]).at[0, 2].set(x[1])
    x_cpm = x_cpm.at[1, 0].set(x[2]).at[1, 2].set(-x[0])
    x_cpm = x_cpm.at[2, 0].set(-x[1]).at[2, 1].set(x[0])
    xx = jnp.outer(x, x)
    mat33_x = cx * jnp.eye(3, dtype=motion3d.dtype) + sx * x_cpm \
        + (1.0 - cx) * xx
    mat33_z = jnp.array([
        [1.0, 0.0, 0.0],
        [0.0, 1.0, 0.0],
        [0.0, 0.0, 1.0],
    ], dtype=motion3d.dtype)
    mat33_z = mat33_z.at[0, 0].set(cz).at[0, 1].set(sz)
    mat33_z = mat33_z.at[1, 0].set(-sz).at[1, 1].set(cz)
    # tiny 3x3 matmuls: force full precision (default matmul precision may
    # be bf16 on TPU, which visibly distorts the rotation)
    return jnp.einsum("ij,kj,kl->il", local, mat33_x, mat33_z,
                      precision=jax.lax.Precision.HIGHEST)


def rotate_motion_3d(motion3d: jax.Array,
                     angles: Optional[jax.Array] = None) -> jax.Array:
    """Apply the body basis (AMASS_dataset.py:502-508): ``basis @ motion``."""
    basis = body_basis(motion3d, angles)
    return jnp.einsum("ij,kjl->kil", basis, motion3d,
                      precision=jax.lax.Precision.HIGHEST)


def project_2d(point3d: jax.Array, focal: float = 4.0, depth: float = 4.0,
               border: float = 10.0, mode: str = "perspective",
               focal_jitter: jax.Array | float = 0.0,
               depth_jitter: jax.Array | float = 0.0) -> jax.Array:
    """Pinhole (or orthogonal) projection of (J, 3, L) → (J, 2, L).

    Matches ``_project_2D`` (AMASS_dataset.py:401-429): y is the depth axis,
    image y is negated z, denominator clamped at ``0.1 * depth`` (computed
    from the *un-jittered* depth, as in the reference), output clipped to
    ``±border``.
    """
    d_min = 0.1 * depth
    f = focal + focal_jitter
    d = depth + depth_jitter
    if mode == "orthogonal":
        point2d = point3d[:, jnp.array([0, 2])]
    else:
        denom = jnp.maximum(point3d[:, 1:2] + d, d_min)
        point2d = f * point3d[:, jnp.array([0, 2])] / denom
    point2d = point2d.at[:, 1].multiply(-1.0)
    return jnp.clip(point2d, -border, border)


def localize(motion: jax.Array, root_idx: int) -> jax.Array:
    """Root-relative coordinates with the absolute root appended as the
    last row (AMASS_dataset.py:519-550).

    (J, D, L) → (J, D, L): root row removed, all rows made root-relative,
    absolute root trajectory appended.
    """
    centers = motion[root_idx]  # (D, L)
    rel = motion - centers[None]
    rel = jnp.concatenate([rel[:root_idx], rel[root_idx + 1:]], axis=0)
    return jnp.concatenate([rel, centers[None]], axis=0)


def globalize(motion: jax.Array, root_idx: int) -> jax.Array:
    """Inverse of :func:`localize` (evaluator ``_globalize``,
    Human_Motion_Modelling/models/evaluator.py:215-228)."""
    centers = motion[-1]  # (D, L) absolute root
    rel = motion[:-1]
    zero = jnp.zeros_like(rel[:1])
    full = jnp.concatenate([rel[:root_idx], zero, rel[root_idx:]], axis=0)
    return full + centers[None]


def normalize(motion: jax.Array, mean: jax.Array,
              std: jax.Array) -> jax.Array:
    """(motion - mean) / std with (J, D) stats (AMASS_dataset.py:552-554)."""
    return (motion - mean[..., None]) / std[..., None]


def denormalize(motion: jax.Array, mean: jax.Array,
                std: jax.Array) -> jax.Array:
    return motion * std[..., None] + mean[..., None]


def keyframe_interpolate(motion: jax.Array, rate: int,
                         mode: str = "linear") -> jax.Array:
    """Interpolate a (..., L) sequence from its every-``rate``-th keyframes.

    Linear matches ``_get_interpolate_motion`` (AMASS_dataset.py:467-482)
    exactly — including evaluating the final partial segment against the
    last frame.  ``quadratic`` reproduces the reference's variant
    (AMASS_dataset.py:484-498).
    """
    seq_len = motion.shape[-1]
    idx = jnp.arange(seq_len)
    chunk = idx // rate
    remain = idx % rate

    prev = motion[..., chunk * rate]
    nxt_idx = jnp.concatenate(
        [(chunk[:-1] + 1) * rate, jnp.array([seq_len - 1])])
    # keyframe index may exceed the clip when L-1 is not a multiple of rate;
    # the reference asserts (L-1) % rate == 0 so this clamp is a no-op there
    nxt = motion[..., jnp.minimum(nxt_idx, seq_len - 1)]

    if mode == "linear":
        w = remain.astype(motion.dtype)
        return prev / rate * (rate - w) + nxt / rate * w

    # quadratic: central differences of keyframes (AMASS_dataset.py:484-498);
    # the first rate+1 positions use the negated *next* keyframe as "prev"
    first_seg = idx <= rate
    prev_key_idx = jnp.where(first_seg, (chunk + 1) * rate,
                             (chunk - 1) * rate)
    prev_key_idx = jnp.clip(prev_key_idx, 0, seq_len - 1)
    prv = motion[..., prev_key_idx]
    sign = jnp.where(first_seg, -1.0, 1.0).astype(motion.dtype)
    prv = prv * sign
    this = prev
    t = (remain / rate).astype(motion.dtype)
    return this + ((nxt - this) + (prv - this)) / 2 * (t ** 2) \
        + ((nxt - this) - (prv - this)) / 2 * t


def frame_double(data: jax.Array, mask: jax.Array,
                 conf: Optional[jax.Array] = None):
    """One linear frame-doubling pass: L → 2L-1
    (``_interpolate_frames``, AMASS_dataset.py:431-465).

    ``mask`` is (L,) int/bool padding mask; midpoints inherit the mask of
    the *next* frame, as in the reference.
    """
    length = data.shape[-1]
    out = jnp.zeros(data.shape[:-1] + (2 * length - 1,), dtype=data.dtype)
    mid = (data[..., 1:] + data[..., :-1]) / 2
    out = out.at[..., ::2].set(data)
    out = out.at[..., 1::2].set(mid)

    new_mask = jnp.zeros((2 * length - 1,), dtype=mask.dtype)
    new_mask = new_mask.at[::2].set(mask)
    new_mask = new_mask.at[1::2].set(mask[1:])

    new_conf = None
    if conf is not None:
        new_conf = jnp.zeros(conf.shape[:-1] + (2 * length - 1,),
                             dtype=conf.dtype)
        cmid = (conf[..., 1:] + conf[..., :-1]) / 2
        new_conf = new_conf.at[..., ::2].set(conf)
        new_conf = new_conf.at[..., 1::2].set(cmid)
    return out, new_mask, new_conf


def interpolate_frames(data: jax.Array, mask: jax.Array,
                       conf: Optional[jax.Array] = None, times: int = 1):
    """Repeated frame doubling (L → 2^times (L-1) + 1)."""
    for _ in range(times):
        data, mask, conf = frame_double(data, mask, conf)
    return data, mask, conf


def encoder_mask_from_pad(pad_mask: jax.Array, rate: int) -> jax.Array:
    """Keyframe visibility mask: True = hidden from the encoder.

    Every ``rate``-th frame is visible unless padded
    (AMASS_dataset.py:221-231).
    """
    seq_len = pad_mask.shape[-1]
    idx = jnp.arange(seq_len)
    sample_mask = (idx % rate) != 0
    return jnp.logical_or(sample_mask, pad_mask.astype(bool))


def decoder_mask_from_encoder(key: jax.Array, encoder_mask: jax.Array,
                              sample_size: int) -> jax.Array:
    """Unmask ``sample_size`` random target positions (with replacement,
    matching ``np.random.randint`` at AMASS_dataset.py:232-236)."""
    seq_len = encoder_mask.shape[-1]
    indices = jax.random.randint(key, (sample_size,), 0, seq_len)
    return encoder_mask.at[indices].set(False)


def random_drop(key: jax.Array, data: jax.Array, rate: int,
                noise_weight: float = 0.5, noise_rate: int = 15,
                joint_drop_rate: int = 15, flip_rate: int = 8) -> jax.Array:
    """Keyframe corruption augmentation (AMASS_dataset.py:577-615).

    On random keyframes: add uniform[0, noise_weight) noise to 5 random
    limb joints, zero out 3 random droppable joints, and swap left/right
    legs.  All selections are without replacement, matching
    ``np.random.choice(..., replace=False)``.
    """
    J, D, L = data.shape
    k_nf, k_df, k_ff, k_noise, k_njoint, k_djoint = jax.random.split(key, 6)

    key_positions = jnp.arange(0, L, rate)

    def choose_frames(k, n):
        perm = jax.random.permutation(k, key_positions.shape[0])
        chosen = key_positions[perm[:n]]
        frame_mask = jnp.zeros((L,), dtype=bool).at[chosen].set(True)
        return frame_mask

    noise_frames = choose_frames(k_nf, noise_rate)       # (L,)
    drop_frames = choose_frames(k_df, joint_drop_rate)
    flip_frames = choose_frames(k_ff, flip_rate)

    def choose_joints(k, pool, n):
        perm = jax.random.permutation(k, pool.shape[0])
        chosen = pool[perm[:n]]
        return jnp.zeros((J,), dtype=bool).at[chosen].set(True)

    noise_joint_mask = choose_joints(k_njoint, NOISE_JOINTS, 5)
    drop_joint_mask = choose_joints(k_djoint, DROP_JOINTS, 3)

    # noise: positive uniform, matching np.random.rand() * noise_weight
    noise = jax.random.uniform(k_noise, (J, D, L),
                               dtype=data.dtype) * noise_weight
    noise_mask = (noise_joint_mask[:, None, None]
                  & noise_frames[None, None, :])
    data = data + jnp.where(noise_mask, noise, 0.0)

    # drop
    drop_mask = drop_joint_mask[:, None, None] & drop_frames[None, None, :]
    data = jnp.where(drop_mask, 0.0, data)

    # left/right leg flip
    swapped = data
    swapped = swapped.at[RIGHT_LEG].set(data[LEFT_LEG])
    swapped = swapped.at[LEFT_LEG].set(data[RIGHT_LEG])
    return jnp.where(flip_frames[None, None, :], swapped, data)


# ---------------------------------------------------------------------------
# Full on-device sample synthesis
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SynthesisParams:
    """Static parameters of the AMASS → network-sample synthesis."""

    rate: int = 8
    sample_size: int = 50
    rotation_axes: Tuple[float, float, float] = (0.2, 0.0, 1.0)
    rotation_aug: bool = True
    focal: float = 4.0
    depth: float = 4.0
    projection_noise: bool = True
    border: float = 10.0
    camera: str = "perspective"
    train_noise: bool = True
    noise_weight: float = 0.5
    noise_rate: int = 15
    joint_drop_rate: int = 15
    flip_rate: int = 8
    return_3d: bool = False


def synthesize_sample(key: jax.Array, motion3d: jax.Array,
                      pad_mask: jax.Array, mean: jax.Array, std: jax.Array,
                      params: SynthesisParams):
    """Raw SMPL 3D crop → training sample, fully on device.

    Equivalent of ``AMASSDataset.__getitem__`` for ``return_type='network'``
    (AMASS_dataset.py:98-148): centralize → random view rotation →
    perspective projection → openpose remap → (clean, noised) localization/
    normalization → masks → linear-interpolation prior.

    Args:
      key: PRNG key for all augmentation randomness.
      motion3d: (52, 3, L) SMPL joints, already temporally cropped/padded.
      pad_mask: (L,) bool, True = zero-padded frame.
      mean, std: (J, D) normalization stats.
      params: static synthesis parameters.

    Returns a dict with (C, L)-flattened ``data``/``input``/``interp`` and
    the three boolean masks, mirroring the reference's batch dict.
    """
    k_view, k_focal, k_depth, k_drop, k_dec = jax.random.split(key, 5)

    axes = jnp.asarray(params.rotation_axes) * jnp.pi
    if params.rotation_aug:
        view = jax.random.uniform(k_view, (3,), minval=-1.0,
                                  maxval=1.0) * axes
    else:
        view = None

    data3d = rotate_motion_3d(centralize(motion3d), view)

    d_min = 0.1 * params.depth
    if params.projection_noise:
        fj = jax.random.uniform(k_focal, (), minval=-d_min, maxval=d_min)
        dj = jax.random.uniform(k_depth, (), minval=-d_min, maxval=d_min)
    else:
        fj = dj = 0.0

    if params.return_3d:
        projected = data3d
        root = ROOT_3D
    else:
        projected = project_2d(data3d, params.focal, params.depth,
                               params.border, params.camera, fj, dj)
        projected = joints_to_openpose(projected)
        root = ROOT_2D

    def to_network(x):
        return normalize(localize(x, root), mean, std)

    clean = to_network(projected)
    noised_src = projected
    if params.train_noise:
        noised_src = random_drop(k_drop, projected, params.rate,
                                 params.noise_weight, params.noise_rate,
                                 params.joint_drop_rate, params.flip_rate)
    noised = to_network(noised_src)

    enc_mask = encoder_mask_from_pad(pad_mask, params.rate)
    dec_mask = decoder_mask_from_encoder(k_dec, enc_mask,
                                         params.sample_size)

    interp = keyframe_interpolate(noised, params.rate)
    inputs = noised * (~enc_mask)[None, None, :]

    C = clean.shape[0] * clean.shape[1]
    L = clean.shape[2]
    return {
        "data": clean.reshape(C, L),
        "input": inputs.reshape(C, L),
        "interp": interp.reshape(C, L),
        "src_mask": enc_mask,
        "tar_mask": dec_mask,
        "mask": pad_mask.astype(bool),
    }


def synthesize_batch(key: jax.Array, motion3d: jax.Array,
                     pad_mask: jax.Array, mean: jax.Array, std: jax.Array,
                     params: SynthesisParams):
    """vmap of :func:`synthesize_sample` over a leading batch axis."""
    keys = jax.random.split(key, motion3d.shape[0])
    return jax.vmap(
        lambda k, m, p: synthesize_sample(k, m, p, mean, std, params)
    )(keys, motion3d, pad_mask)
