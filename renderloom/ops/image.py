"""Image ops: affine augmentation, warping, blur, PSNR/SSIM.

On-device replacements for the CPU libraries the reference leans on:

* the shared albumentations Resize+ShiftScaleRotate window transform
  applied to images *and* keypoints
  (``Pose_Guided_Neural_Rendering/datasets/HSM_auto_dataset.py:16-36``)
  becomes an explicit 2×3 affine matrix applied with bilinear
  ``map_coordinates`` sampling — the host only decodes PNG bytes;
* PIL ``GaussianBlur(radius=10)`` (``HSM_auto_dataset.py:155``) becomes a
  separable gaussian convolution;
* piq ``psnr``/``ssim`` (``models/evaluator.py:149-163``) become jnp
  implementations (SSIM: 11×11 gaussian window, σ=1.5, k1=0.01,
  k2=0.03 — the piq/skimage convention).

All functions are jittable and vmappable; images are NHWC or HWC float32.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Affine window transform (ShiftScaleRotate semantics)
# ---------------------------------------------------------------------------


def shift_scale_rotate_matrix(height: int, width: int, shift_x: jax.Array,
                              shift_y: jax.Array, scale: jax.Array,
                              angle_deg: jax.Array) -> jax.Array:
    """Forward 2×3 affine (albumentations ShiftScaleRotate convention):
    rotate by ``angle_deg`` about the image center, scale by
    ``1 + scale``, then translate by ``(shift_x·W, shift_y·H)``.

    Returns M with ``[x', y']ᵀ = M @ [x, y, 1]ᵀ``.
    """
    theta = angle_deg * (math.pi / 180.0)
    s = 1.0 + scale
    cos, sin = jnp.cos(theta) * s, jnp.sin(theta) * s
    cx, cy = width / 2.0, height / 2.0
    # rotation+scale about center, then shift
    tx = cx - cos * cx + sin * cy + shift_x * width
    ty = cy - sin * cx - cos * cy + shift_y * height
    return jnp.array([[cos, -sin, tx], [sin, cos, ty]])


def invert_affine(m: jax.Array) -> jax.Array:
    """Invert a 2×3 affine matrix."""
    a, b, tx = m[0]
    c, d, ty = m[1]
    det = a * d - b * c
    ia, ib = d / det, -b / det
    ic, id_ = -c / det, a / det
    itx = -(ia * tx + ib * ty)
    ity = -(ic * tx + id_ * ty)
    return jnp.array([[ia, ib, itx], [ic, id_, ity]])


def bilinear_sample(img: jax.Array, sx: jax.Array, sy: jax.Array,
                    mode: str = "constant") -> jax.Array:
    """Bilinear sampling of (H, W, C) at float coords (sx, sy).

    Hand-rolled instead of ``jax.scipy.ndimage.map_coordinates``: the
    math is identical (per-corner zeroing for ``constant`` / coordinate
    clamping for ``nearest``), all channels move in one row-gather per
    corner, and — decisive on this target — it compiles ~30× faster
    than map_coordinates' scatter/gather expansion.
    """
    H, W, C = img.shape
    if mode == "nearest":
        sx = jnp.clip(sx, 0.0, W - 1.0)
        sy = jnp.clip(sy, 0.0, H - 1.0)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = (sx - x0)[..., None]
    wy = (sy - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    flat = img.reshape(H * W, C)

    def corner(yi, xi):
        inside = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        vals = jnp.take(flat, idx.reshape(-1), axis=0)
        vals = vals.reshape(idx.shape + (C,))
        if mode == "constant":
            vals = vals * inside[..., None]
        return vals

    return ((1 - wx) * (1 - wy) * corner(y0i, x0i)
            + wx * (1 - wy) * corner(y0i, x0i + 1)
            + (1 - wx) * wy * corner(y0i + 1, x0i)
            + wx * wy * corner(y0i + 1, x0i + 1))


def affine_warp(img: jax.Array, m: jax.Array, height: Optional[int] = None,
                width: Optional[int] = None) -> jax.Array:
    """Apply forward affine ``m`` to an (H, W, C) image via inverse-map
    bilinear sampling; out-of-border reads are zero (the reference uses
    ``BORDER_CONSTANT`` 0, HSM_auto_dataset.py:26)."""
    H, W, C = img.shape
    out_h = height or H
    out_w = width or W
    inv = invert_affine(m)
    ys, xs = jnp.meshgrid(jnp.arange(out_h, dtype=jnp.float32),
                          jnp.arange(out_w, dtype=jnp.float32),
                          indexing="ij")
    src_x = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
    src_y = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]
    return bilinear_sample(img, src_x, src_y, mode="constant")


def _axis_resample_weights(src: int, out: int,
                           inv_scale: np.float32) -> np.ndarray:
    """(out, src) bilinear row-resample weights for the axis map
    ``src_x = x' · inv_scale`` — the inverse map :func:`affine_warp`
    uses for a pure :func:`resize_matrix` affine.  Built in float32
    numpy at trace time (static shapes, mirrors the warp's float32
    coordinate arithmetic); out-of-range taps contribute zero
    (BORDER_CONSTANT, HSM_auto_dataset.py:26)."""
    xs = np.arange(out, dtype=np.float32) * np.float32(inv_scale)
    x0 = np.floor(xs)
    w = (xs - x0).astype(np.float32)
    x0i = x0.astype(np.int64)
    mat = np.zeros((out, src), np.float32)
    rows = np.arange(out)
    lo_in = (x0i >= 0) & (x0i < src)
    hi_in = (x0i + 1 >= 0) & (x0i + 1 < src)
    mat[rows[lo_in], x0i[lo_in]] += (1.0 - w)[lo_in]
    mat[rows[hi_in], np.clip(x0i + 1, 0, src - 1)[hi_in]] += w[hi_in]
    return mat


def separable_resize(img: jax.Array, dst_h: int, dst_w: int,
                     out_h: Optional[int] = None,
                     out_w: Optional[int] = None) -> jax.Array:
    """Pure-scale resize of (..., H, W, C) as two dense matmuls.

    Exactly the map ``affine_warp(img, resize_matrix(H, W, dst_h,
    dst_w), out_h, out_w)`` computes — but an axis-aligned affine
    factorizes the bilinear sample into per-axis 2-tap row
    combinations, and on TPU an (out, src) weight matmul rides the MXU
    where the general warp's per-pixel 2-D gathers serialize on the
    scalar/vector units.  ``out_h/out_w`` (default ``dst_h/dst_w``)
    crop the top-left window of the resized image, matching the warp's
    output-size semantics when load size ≠ model size.  Used by the
    deterministic eval/serving ingest (``data/hsm.py``) for the
    reference's on-disk 768×512 → model 480×320 resample
    (``HumanSloMo_Dataset/lib/gen_dataset.py:36`` frames into
    ``datasets/HSM_auto_dataset.py:103-116`` A.Resize)."""
    H, W = img.shape[-3], img.shape[-2]
    out_h = dst_h if out_h is None else out_h
    out_w = dst_w if out_w is None else out_w
    # mirror invert_affine's float32 arithmetic exactly: for the
    # diagonal resize affine m = diag(a, d) it computes
    # inv_x = d/(a·d), inv_y = a/(a·d) — NOT 1/a, 1/d — so floor
    # crossings land on the same side as the gather path's.
    a = np.float32(dst_w / W)
    d = np.float32(dst_h / H)
    det = np.float32(a * d)
    ah = jnp.asarray(_axis_resample_weights(H, out_h, np.float32(a / det)),
                     img.dtype)
    aw = jnp.asarray(_axis_resample_weights(W, out_w, np.float32(d / det)),
                     img.dtype)
    out = jnp.einsum("oh,...hwc->...owc", ah, img)
    return jnp.einsum("pw,...owc->...opc", aw, out)


def transform_keypoints(kps: jax.Array, m: jax.Array) -> jax.Array:
    """(J, 2) xy through the forward affine."""
    x = m[0, 0] * kps[:, 0] + m[0, 1] * kps[:, 1] + m[0, 2]
    y = m[1, 0] * kps[:, 0] + m[1, 1] * kps[:, 1] + m[1, 2]
    return jnp.stack([x, y], axis=-1)


def resize_matrix(src_h: int, src_w: int, dst_h: int,
                  dst_w: int) -> jax.Array:
    """Affine for a plain resize (the A.Resize stage)."""
    return jnp.array([[dst_w / src_w, 0.0, 0.0],
                      [0.0, dst_h / src_h, 0.0]])


def compose_affine(m2: jax.Array, m1: jax.Array) -> jax.Array:
    """m2 ∘ m1 (both 2×3)."""
    a = jnp.concatenate([m1, jnp.array([[0.0, 0.0, 1.0]])], axis=0)
    b = jnp.concatenate([m2, jnp.array([[0.0, 0.0, 1.0]])], axis=0)
    return (b @ a)[:2]


# ---------------------------------------------------------------------------
# Gaussian blur (PIL GaussianBlur equivalent)
# ---------------------------------------------------------------------------


def gaussian_kernel1d(sigma: float, radius: int) -> jax.Array:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(img: jax.Array, radius: float = 10.0) -> jax.Array:
    """Separable gaussian blur of (H, W, C); PIL's ``GaussianBlur(r)``
    uses σ ≈ r (HSM_auto_dataset.py:155 blurs the background with
    radius 10 to simulate warp artifacts)."""
    sigma = float(radius)
    r = int(2 * sigma)
    k = gaussian_kernel1d(sigma, r)
    x = jnp.moveaxis(img, -1, 0)[:, None]         # (C, 1, H, W)
    kh = k.reshape(1, 1, -1, 1)
    kw = k.reshape(1, 1, 1, -1)
    pad_h = [(0, 0), (0, 0), (r, r), (0, 0)]
    pad_w = [(0, 0), (0, 0), (0, 0), (r, r)]
    x = jnp.pad(x, pad_h, mode="edge")
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID")
    x = jnp.pad(x, pad_w, mode="edge")
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID")
    return jnp.moveaxis(x[:, 0], 0, -1)


# ---------------------------------------------------------------------------
# PSNR / SSIM (piq-compatible, evaluator.py:149-163)
# ---------------------------------------------------------------------------


def psnr(pred: jax.Array, target: jax.Array,
         data_range: float = 1.0) -> jax.Array:
    """Mean PSNR over the batch; inputs (..., H, W, C) in [0, range]."""
    axes = tuple(range(pred.ndim))[1:] if pred.ndim > 3 else None
    mse = jnp.mean((pred - target) ** 2, axis=axes)
    val = 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))
    return jnp.mean(val)


def _ssim_window(kernel_size: int = 11, sigma: float = 1.5) -> jax.Array:
    k = gaussian_kernel1d(sigma, kernel_size // 2)
    return jnp.outer(k, k)


def ssim(pred: jax.Array, target: jax.Array, data_range: float = 1.0,
         kernel_size: int = 11, sigma: float = 1.5) -> jax.Array:
    """Mean SSIM (gaussian 11×11 σ1.5, k1=.01, k2=.03).  NHWC or HWC."""
    if pred.ndim == 3:
        pred = pred[None]
        target = target[None]
    win = _ssim_window(kernel_size, sigma)
    C = pred.shape[-1]
    kernel = jnp.tile(win[None, None], (C, 1, 1, 1))   # (C,1,kh,kw)

    def filt(x):
        x = jnp.moveaxis(x, -1, 1)                     # NCHW
        y = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), "VALID", feature_group_count=C)
        return y

    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_x = filt(pred)
    mu_y = filt(target)
    mu_x2, mu_y2, mu_xy = mu_x ** 2, mu_y ** 2, mu_x * mu_y
    sigma_x = filt(pred * pred) - mu_x2
    sigma_y = filt(target * target) - mu_y2
    sigma_xy = filt(pred * target) - mu_xy
    ssim_map = ((2 * mu_xy + c1) * (2 * sigma_xy + c2)) \
        / ((mu_x2 + mu_y2 + c1) * (sigma_x + sigma_y + c2))
    return jnp.mean(ssim_map)


def denorm_to_unit(x: jax.Array) -> jax.Array:
    """[-1, 1] → clamped [0, 1] (evaluator.py:151-154)."""
    return jnp.clip(x * 0.5 + 0.5, 0.0, 1.0)


def masked_metrics(pred: jax.Array, target: jax.Array,
                   fg_mask: Optional[jax.Array] = None
                   ) -> Tuple[jax.Array, jax.Array]:
    """Reference metric protocol (evaluator.py:149-163): denormalize,
    clamp, foreground-mask, PSNR + SSIM at data_range 1."""
    p = denorm_to_unit(pred)
    t = denorm_to_unit(target)
    if fg_mask is not None:
        p = p * fg_mask
        t = t * fg_mask
    return psnr(p, t), ssim(p, t)
