"""Image ops + flow interpolator tests (SURVEY.md §4 seams 1-2)."""

import jax
import jax.numpy as jnp
import numpy as np

from renderloom.ops import flow as flow_ops
from renderloom.ops import image as img_ops


def test_affine_identity():
    img = jnp.arange(48.0).reshape(4, 4, 3)
    m = img_ops.shift_scale_rotate_matrix(4, 4, 0.0, 0.0, 0.0, 0.0)
    out = img_ops.affine_warp(img, m)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-4)


def test_affine_shift_moves_keypoints_and_pixels_together():
    H = W = 32
    img = jnp.zeros((H, W, 1)).at[10, 12, 0].set(1.0)
    m = img_ops.shift_scale_rotate_matrix(H, W, 0.25, 0.25, 0.0, 0.0)
    out = img_ops.affine_warp(img, m)
    kp = img_ops.transform_keypoints(jnp.array([[12.0, 10.0]]), m)
    x, y = float(kp[0, 0]), float(kp[0, 1])
    assert abs(x - 20.0) < 1e-4 and abs(y - 18.0) < 1e-4
    assert float(out[18, 20, 0]) > 0.9


def test_affine_rotation_keypoint_consistency():
    H = W = 64
    m = img_ops.shift_scale_rotate_matrix(H, W, 0.0, 0.0, 0.0, 90.0)
    # center is fixed
    c = img_ops.transform_keypoints(jnp.array([[32.0, 32.0]]), m)
    np.testing.assert_allclose(np.asarray(c), [[32.0, 32.0]], atol=1e-3)
    # a point to the right of center rotates to below (y grows downward,
    # positive angle = CCW in albumentations convention → image-space CW)
    p = img_ops.transform_keypoints(jnp.array([[42.0, 32.0]]), m)
    assert abs(float(p[0, 0]) - 32.0) < 1e-3
    assert abs(abs(float(p[0, 1]) - 32.0) - 10.0) < 1e-3


def test_resize_matrix_scales():
    m = img_ops.resize_matrix(512, 768, 320, 480)
    kp = img_ops.transform_keypoints(jnp.array([[768.0, 512.0]]), m)
    np.testing.assert_allclose(np.asarray(kp), [[480.0, 320.0]], atol=1e-4)


def test_compose_affine_matches_sequential():
    m1 = img_ops.resize_matrix(64, 64, 32, 32)
    m2 = img_ops.shift_scale_rotate_matrix(32, 32, 0.1, -0.05, 0.08, 15.0)
    m = img_ops.compose_affine(m2, m1)
    pts = jnp.array([[10.0, 20.0], [50.0, 5.0]])
    seq = img_ops.transform_keypoints(img_ops.transform_keypoints(pts, m1),
                                      m2)
    one = img_ops.transform_keypoints(pts, m)
    np.testing.assert_allclose(np.asarray(one), np.asarray(seq), atol=1e-4)


def test_psnr_known_value():
    a = jnp.zeros((1, 8, 8, 3))
    b = jnp.full((1, 8, 8, 3), 0.1)
    # mse = 0.01 → psnr = 20
    assert abs(float(img_ops.psnr(a, b)) - 20.0) < 1e-4


def test_ssim_identical_is_one():
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (1, 32, 32, 3))
    assert abs(float(img_ops.ssim(img, img)) - 1.0) < 1e-5
    noisy = jnp.clip(img + 0.3 * jax.random.normal(key, img.shape), 0, 1)
    assert float(img_ops.ssim(img, noisy)) < 0.95


def test_gaussian_blur_preserves_mean():
    key = jax.random.PRNGKey(1)
    img = jax.random.uniform(key, (32, 32, 3))
    out = img_ops.gaussian_blur(img, 5.0)
    assert abs(float(img.mean()) - float(out.mean())) < 0.02
    # blur reduces variance
    assert float(out.var()) < float(img.var())


# ------------------------------------------------------------------ flow


def _shifted_pair(shift=3):
    """Two frames of a textured pattern translated by `shift` px in x."""
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 1, (70, 90, 3)).astype(np.float32)
    base = np.asarray(img_ops.gaussian_blur(jnp.asarray(base), 2.0))
    a = base[:, :-shift * 2]
    b = base[:, shift:-shift]
    return jnp.asarray(a), jnp.asarray(b)


def test_estimate_flow_recovers_translation():
    a, b = _shifted_pair(3)
    flow = flow_ops.estimate_flow(a, b, levels=3, iters=5)
    inner = np.asarray(flow[15:-15, 15:-15])
    # b(x) = a(x+3) so the a→b correspondence field is ≈ (−3, 0) px
    assert abs(inner[:, :, 0].mean() - (-3.0)) < 0.8
    assert abs(inner[:, :, 1].mean()) < 0.5


def test_interpolate_pair_midpoint():
    a, b = _shifted_pair(4)
    mid = flow_ops.interpolate_pair(a, b, 0.5, levels=3, iters=5)
    # ground-truth midpoint = shift by 2
    gt = flow_ops.backward_warp(a, jnp.full(a.shape[:2] + (2,), 0.0
                                            ).at[:, :, 0].set(2.0))
    err_interp = float(jnp.abs(mid - gt)[10:-10, 10:-10].mean())
    err_naive = float(jnp.abs((a + b) / 2 - gt)[10:-10, 10:-10].mean())
    assert err_interp < err_naive  # flow beats frame averaging
    assert err_interp < 0.05


def test_upsample_background_counts():
    a, b = _shifted_pair(4)
    frames = jnp.stack([a, b])
    out = flow_ops.upsample_background(frames, 4, levels=3, iters=2)
    assert out.shape[0] == 5
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(a))
    np.testing.assert_allclose(np.asarray(out[4]), np.asarray(b))


def test_train_background_shape():
    rng = np.random.default_rng(1)
    frames = jnp.asarray(rng.uniform(0, 1, (5, 48, 64, 3)
                                     ).astype(np.float32))
    out = flow_ops.train_background(frames, levels=3, iters=2)
    assert out.shape == frames.shape
