"""Rasterizer properties (golden-value tests per SURVEY.md §4 seam 2).

Checks the closed-form rasterizers reproduce the reference semantics:
unit-peak gaussians at integer joint pixels, straight thick limbs with
endpoint dots and color averaging, capsule/disk union masks, validity
gating, and batch vmapping.
"""

import jax
import jax.numpy as jnp
import numpy as np

from renderloom.ops import rasterize as R

H, W = 64, 128


def test_heatmap_peak_and_falloff():
    coords = jnp.array([[30.4, 20.7]] + [[-1.0, -1.0]] * 18)
    conf = jnp.ones(19)
    sigma = jnp.full((19,), 5.0)
    maps = R.gaussian_heatmaps(coords, conf, H, W, sigma)
    # peak 1 at the floored pixel
    assert abs(float(maps[0, 20, 30]) - 1.0) < 1e-6
    # falloff = exp(-d^2 / 2 sigma^2)
    expected = np.exp(-(7 ** 2) / (2 * 25.0))
    assert abs(float(maps[0, 20, 37]) - expected) < 1e-5
    # invalid joints are all-zero channels
    assert float(jnp.abs(maps[1:]).max()) == 0.0


def test_heatmap_confidence_gate():
    coords = jnp.tile(jnp.array([[10.0, 10.0]]), (19, 1))
    conf = jnp.zeros(19).at[3].set(1.0)
    maps = R.gaussian_heatmaps(coords, conf, H, W, jnp.full((19,), 4.0))
    assert float(maps[3].max()) == 1.0
    assert float(jnp.delete(maps, 3, axis=0).max()) == 0.0


def test_skeleton_straight_limb_color():
    # only joints 0 and 1 valid → single head-neck limb, color [153,0,51]
    coords = jnp.full((19, 2), -1.0)
    coords = coords.at[0].set(jnp.array([20.0, 10.0]))
    coords = coords.at[1].set(jnp.array([60.0, 10.0]))
    conf = jnp.zeros(19).at[0].set(1.0).at[1].set(1.0)
    img = R.skeleton_image(coords, conf, H, W)
    mid = np.asarray(img[:, 10, 40])
    np.testing.assert_allclose(mid, np.array([153, 0, 51]) / 255.0,
                               atol=1e-6)
    # off-limb pixel is empty
    assert float(jnp.abs(img[:, 40, 100]).max()) == 0.0
    # brush thickness ~4px: 3px off-axis still covered, 10px not
    assert np.asarray(img[:, 13, 40]).max() > 0
    assert np.asarray(img[:, 25, 40]).max() == 0


def test_skeleton_color_averaging():
    # joints 1, 2, 8 valid → limbs (1,2) and (1,8) overlap near joint 1
    coords = jnp.full((19, 2), -1.0)
    coords = coords.at[1].set(jnp.array([40.0, 30.0]))
    coords = coords.at[2].set(jnp.array([80.0, 30.0]))
    coords = coords.at[8].set(jnp.array([40.0, 60.0]))
    conf = jnp.zeros(19).at[1].set(1.0).at[2].set(1.0).at[8].set(1.0)
    img = R.skeleton_image(coords, conf, H, W)
    # at joint 1 both endpoint dots overlap → average of the two colors
    expected = (np.array([153, 51, 0]) + np.array([153, 0, 0])) / 2 / 255.0
    np.testing.assert_allclose(np.asarray(img[:, 30, 40]), expected,
                               atol=1e-6)


def test_human_mask_covers_limbs_and_disks():
    coords = jnp.full((19, 2), -1.0)
    coords = coords.at[0].set(jnp.array([30.0, 10.0]))
    coords = coords.at[1].set(jnp.array([30.0, 40.0]))
    conf = jnp.zeros(19).at[0].set(1.0).at[1].set(1.0)
    mask, part = R.human_masks(coords, conf, H, W)
    # segment midpoint covered; head disk radius 30 reaches (58, 10)
    assert bool(mask[25, 30])
    assert bool(mask[10, 58])
    # radius 15 capsule: 14px lateral still in, 32px out
    assert bool(mask[25, 44])
    assert not bool(mask[25, 62])
    # no part_keep → empty part mask
    assert not bool(part.any())


def test_part_mask_subset():
    coords = jnp.full((19, 2), -1.0)
    coords = coords.at[0].set(jnp.array([30.0, 10.0]))
    coords = coords.at[1].set(jnp.array([30.0, 40.0]))
    conf = jnp.zeros(19).at[0].set(1.0).at[1].set(1.0)
    part_keep = jnp.zeros(R.MASK_EDGES.shape[0], bool).at[0].set(True)
    mask, part = R.human_masks(coords, conf, H, W, part_keep)
    assert bool(part[25, 30])
    # part mask is a subset of the full mask
    assert not bool((part & ~mask).any())


def test_rasterize_frames_batched_jit():
    F, J = 3, 19
    key = jax.random.PRNGKey(0)
    coords = jax.random.uniform(key, (F, J, 2)) * jnp.array([W, H])
    conf = jnp.ones((F, J))

    @jax.jit
    def run(c, cf):
        return R.rasterize_frames(None, c, cf, H, W, train=False)

    out = run(coords, conf)
    assert out["heatmaps"].shape == (F, J, H, W)
    assert out["skeleton"].shape == (F, 3, H, W)
    assert out["mask"].shape == (F, H, W)
    assert np.isfinite(np.asarray(out["skeleton"])).all()
    # every frame has some foreground
    assert bool(np.asarray(out["mask"]).any(axis=(1, 2)).all())


def test_rasterize_frame_train_randomness_reproducible():
    key = jax.random.PRNGKey(7)
    coords = jnp.array([[30.0, 20.0]] * 19)
    conf = jnp.ones(19)
    a = R.rasterize_frame(key, coords, conf, H, W, train=True)
    b = R.rasterize_frame(key, coords, conf, H, W, train=True)
    np.testing.assert_array_equal(np.asarray(a["heatmaps"]),
                                  np.asarray(b["heatmaps"]))
