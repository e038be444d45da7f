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


def _textured_scene(rng, H=96, W=128):
    """Isotropic multi-scale blob texture: well-conditioned structure
    tensors everywhere (oriented gratings would hit the aperture
    problem and say nothing about the estimator)."""
    img = np.zeros((H, W, 3), np.float32)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    for _ in range(40):
        cx, cy = rng.uniform(0, W), rng.uniform(0, H)
        s = rng.uniform(3, 12)
        a = rng.uniform(-0.5, 0.5, 3)
        g = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s))
        img += g[..., None] * a
    return (img - img.min()) / (img.max() - img.min())


def _affine_sample(img, mat):
    """Bilinear sample of img at affine-transformed coords (float np)."""
    H, W, C = img.shape
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    sx = mat[0, 0] * xx + mat[0, 1] * yy + mat[0, 2]
    sy = mat[1, 0] * xx + mat[1, 1] * yy + mat[1, 2]
    x0 = np.clip(np.floor(sx).astype(int), 0, W - 2)
    y0 = np.clip(np.floor(sy).astype(int), 0, H - 2)
    fx = np.clip(sx - x0, 0, 1)[..., None]
    fy = np.clip(sy - y0, 0, 1)[..., None]
    out = (img[y0, x0] * (1 - fx) * (1 - fy)
           + img[y0, x0 + 1] * fx * (1 - fy)
           + img[y0 + 1, x0] * (1 - fx) * fy
           + img[y0 + 1, x0 + 1] * fx * fy)
    return out.astype(np.float32)


def test_interpolator_beats_blend_on_camera_pan():
    """DAIN-role anchor (VERDICT): on a realistic camera pan+zoom, the
    flow-interpolated midframe must beat the naive 50/50 blend baseline
    by a clear PSNR margin, and be decent in absolute terms."""
    from renderloom.ops.flow import interpolate_pair

    rng = np.random.default_rng(0)
    scene = _textured_scene(rng)

    # camera motion: 6px pan + 2% zoom about the center over the pair
    def cam(t):
        s = 1.0 + 0.02 * t
        cx, cy = 64.0, 48.0
        return np.array([[s, 0, (1 - s) * cx + 6.0 * t],
                         [0, s, (1 - s) * cy + 2.0 * t]], np.float32)

    f0 = _affine_sample(scene, cam(0.0))
    f1 = _affine_sample(scene, cam(1.0))
    gt_mid = _affine_sample(scene, cam(0.5))

    mid = np.asarray(interpolate_pair(jnp.asarray(f0), jnp.asarray(f1),
                                      jnp.asarray(0.5), levels=3,
                                      iters=3))
    blend = 0.5 * (f0 + f1)

    def psnr(a, b):
        m = 12  # ignore the border the pan shifts in from
        mse = float(np.mean((a[m:-m, m:-m] - b[m:-m, m:-m]) ** 2))
        return 10 * np.log10(1.0 / max(mse, 1e-10))

    p_flow = psnr(mid, gt_mid)
    p_blend = psnr(blend, gt_mid)
    # measured ~54 dB vs ~39 dB blend on this scene; generous margins
    assert p_flow > p_blend + 8.0, (p_flow, p_blend)
    assert p_flow > 40.0, p_flow


def test_upsample_direct_matches_doubling_at_rate2():
    """The direct multi-t path with t=0.5 is the same math as one
    recursive-doubling pass — bit-compatible for rate 2."""
    rng = np.random.default_rng(2)
    frames = jnp.asarray(rng.uniform(0, 1, (3, 32, 48, 3)), jnp.float32)
    direct = flow_ops.upsample_background(frames, 2, levels=2, iters=2)
    doubled = flow_ops.frame_double_pairs(frames, levels=2, iters=2)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(doubled),
                               atol=1e-5)


def test_upsample_background_non_power_of_two_rate():
    """The direct LK path supports arbitrary rates (the reference's
    recursive doubling is power-of-two only)."""
    rng = np.random.default_rng(3)
    frames = jnp.asarray(rng.uniform(0, 1, (3, 16, 24, 3)), jnp.float32)
    out = flow_ops.upsample_background(frames, 3, levels=2, iters=1)
    assert out.shape == (7, 16, 24, 3)
    np.testing.assert_allclose(np.asarray(out[::3]), np.asarray(frames),
                               atol=1e-6)


def test_upsample_background_flow_scale():
    rng = np.random.default_rng(4)
    frames = jnp.asarray(rng.uniform(0, 1, (2, 32, 48, 3)), jnp.float32)
    out = flow_ops.upsample_background(frames, 2, levels=2, iters=2,
                                       flow_scale=2)
    assert out.shape == (3, 32, 48, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_shift_warp_exact_on_constant_flow():
    """backward_warp_shift == the gather bilinear warp when the flow is
    locally constant (the separable decomposition is exact there)."""
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.uniform(0, 1, (32, 48, 3)), jnp.float32)
    flow = jnp.full((32, 48, 2), 0.0).at[..., 0].set(2.7).at[..., 1].set(
        -1.3)
    ref = flow_ops.backward_warp(img, flow)
    fast = flow_ops.backward_warp_shift(img, flow, max_disp=8)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=1e-5)


def test_shift_warp_close_on_smooth_flow():
    """On a smoothly-varying field the separability error stays small
    (the production regime: flow estimated at 1/4 res is smooth)."""
    rng = np.random.default_rng(6)
    img = jnp.asarray(rng.uniform(0, 1, (40, 56, 3)), jnp.float32)
    yy, xx = np.mgrid[0:40, 0:56].astype(np.float32)
    fx = 2.0 * np.sin(2 * np.pi * xx / 56) * np.cos(2 * np.pi * yy / 40)
    fy = 1.5 * np.cos(2 * np.pi * xx / 56)
    flow = jnp.asarray(np.stack([fx, fy], -1))
    ref = flow_ops.backward_warp(img, flow)
    fast = flow_ops.backward_warp_shift(img, flow, max_disp=8)
    err = float(jnp.abs(fast - ref)[4:-4, 4:-4].mean())
    # uniform-noise image + a field rougher than production quarter-res
    # flow: a deliberately pessimistic bound.  The separable warp must
    # still be an order of magnitude closer to the exact warp than the
    # warp is to the unwarped image.
    base = float(jnp.abs(ref - img)[4:-4, 4:-4].mean())
    assert err < 0.05, err
    assert err < 0.2 * base, (err, base)


def test_shift_warp_edge_clamp():
    """Displacements past the border read edge values, matching
    bilinear_sample(mode='nearest') semantics."""
    img = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4, 1)
                      * jnp.ones((3, 4, 1)))
    flow = jnp.full((3, 4, 2), 0.0).at[..., 0].set(10.0)  # off the right
    ref = flow_ops.backward_warp(img, flow)
    fast = flow_ops.backward_warp_shift(img, flow, max_disp=12)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=1e-5)


def test_separable_resize_matches_affine_warp():
    """The separable MXU-matmul resize must reproduce the general
    gather warp exactly for every pure-scale affine the deterministic
    ingest path can see (down-, up-, mixed-scale, and the reference's
    on-disk 768x512 -> 480x320)."""
    rng = np.random.default_rng(3)
    for (sh, sw), (dh, dw) in [((512, 768), (320, 480)),
                               ((64, 96), (96, 64)),
                               ((40, 40), (56, 80)),
                               ((33, 47), (17, 29))]:
        img = jnp.asarray(rng.uniform(-1, 1, (sh, sw, 3)).astype(
            np.float32))
        m = img_ops.resize_matrix(sh, sw, dh, dw)
        ref = img_ops.affine_warp(img, m, dh, dw)
        sep = img_ops.separable_resize(img, dh, dw)
        np.testing.assert_allclose(np.asarray(sep), np.asarray(ref),
                                   atol=2e-6, rtol=0,
                                   err_msg=f"{(sh, sw)}->{(dh, dw)}")


def test_separable_resize_crop_matches_warp_output_size():
    """load size != model size: the warp resizes to load and emits the
    top-left model-size window; separable_resize(out_h, out_w) must
    match that crop semantics."""
    rng = np.random.default_rng(4)
    sh, sw, lh, lw, oh, ow = 50, 70, 40, 60, 32, 48
    img = jnp.asarray(rng.uniform(-1, 1, (sh, sw, 3)).astype(np.float32))
    m = img_ops.resize_matrix(sh, sw, lh, lw)
    ref = img_ops.affine_warp(img, m, oh, ow)
    sep = img_ops.separable_resize(img, lh, lw, oh, ow)
    np.testing.assert_allclose(np.asarray(sep), np.asarray(ref),
                               atol=2e-6, rtol=0)
