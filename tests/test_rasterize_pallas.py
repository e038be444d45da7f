"""Pallas fused rasterizer vs the jnp reference implementation.

Runs the kernel in interpret mode (CPU backend) and asserts numerical
agreement with ``renderloom.ops.rasterize`` on identical inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np

from renderloom.ops import rasterize as R
from renderloom.ops.rasterize_pallas import rasterize_frames_fused

H, W = 64, 128


def _random_frames(n=2, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    coords = jax.random.uniform(k1, (n, 19, 2)) * jnp.array([W, H])
    conf = jnp.where(jax.random.uniform(k2, (n, 19)) > 0.2, 0.9, 0.0)
    return coords, conf


def test_fused_matches_jnp_eval_path():
    coords, conf = _random_frames()
    fused = rasterize_frames_fused(None, coords, conf, H, W,
                                   gauss_sigma=4.0, train=False,
                                   tile_h=32, interpret=True)
    ref = R.rasterize_frames(None, coords, conf, H, W, gauss_sigma=4.0,
                             train=False)
    np.testing.assert_allclose(np.asarray(fused["heatmaps"]),
                               np.asarray(ref["heatmaps"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fused["skeleton"]),
                               np.asarray(ref["skeleton"]), atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(fused["mask"]) > 0.5, np.asarray(ref["mask"]))
    np.testing.assert_array_equal(
        np.asarray(fused["part_mask"]) > 0.5,
        np.asarray(ref["part_mask"]))


def test_fused_train_path_reproducible():
    coords, conf = _random_frames(1, seed=3)
    key = jax.random.PRNGKey(11)
    a = rasterize_frames_fused(key, coords, conf, H, W, train=True,
                               tile_h=32, interpret=True)
    b = rasterize_frames_fused(key, coords, conf, H, W, train=True,
                               tile_h=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(a["heatmaps"]),
                                  np.asarray(b["heatmaps"]))
    # train path uses the same table-building RNG layout as the jnp
    # rasterizer, so outputs agree there too
    ref = R.rasterize_frames(key, coords, conf, H, W, train=True)
    np.testing.assert_allclose(np.asarray(a["heatmaps"]),
                               np.asarray(ref["heatmaps"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a["skeleton"]),
                               np.asarray(ref["skeleton"]), atol=1e-5)


def test_fused_bf16_labels():
    """out_dtype=bfloat16 emits the label stream at half the bytes with
    values equal to the f32 path up to bf16 rounding."""
    import jax.numpy as jnp
    coords, conf = _random_frames(2, seed=4)
    f32 = rasterize_frames_fused(None, coords, conf, H, W, train=False,
                                 tile_h=32, interpret=True)
    b16 = rasterize_frames_fused(None, coords, conf, H, W, train=False,
                                 tile_h=32, interpret=True,
                                 out_dtype=jnp.bfloat16)
    assert b16["heatmaps"].dtype == jnp.bfloat16
    assert b16["skeleton"].dtype == jnp.bfloat16
    assert b16["mask"].dtype == jnp.float32        # loss masks stay f32
    np.testing.assert_allclose(
        np.asarray(b16["heatmaps"], np.float32),
        np.asarray(f32["heatmaps"]), atol=8e-3)
    np.testing.assert_allclose(
        np.asarray(b16["skeleton"], np.float32),
        np.asarray(f32["skeleton"]), atol=8e-3)


def test_nhwc_layout_matches_cfhw():
    coords, conf = _random_frames(2, seed=5)
    ref = rasterize_frames_fused(None, coords, conf, H, W,
                                 gauss_sigma=4.0, train=False,
                                 tile_h=32, interpret=True)
    got = rasterize_frames_fused(None, coords, conf, H, W,
                                 gauss_sigma=4.0, train=False,
                                 tile_h=32, interpret=True,
                                 layout="nhwc")
    # nhwc label = [skel*2-1 (3ch), heat (19ch)] channels-last
    skel = np.transpose(np.asarray(ref["skeleton"]), (0, 2, 3, 1))
    heat = np.transpose(np.asarray(ref["heatmaps"]), (0, 2, 3, 1))
    want = np.concatenate([skel * 2.0 - 1.0, heat], axis=-1)
    assert got["label"].shape == (2, H, W, 22)
    np.testing.assert_allclose(np.asarray(got["label"]), want, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got["mask"]),
                                  np.asarray(ref["mask"]))
    np.testing.assert_array_equal(np.asarray(got["part_mask"]),
                                  np.asarray(ref["part_mask"]))


def test_packed_layout_is_s2d_of_nhwc():
    from renderloom.models.fastpath import space_to_depth
    coords, conf = _random_frames(2, seed=6)
    nhwc = rasterize_frames_fused(None, coords, conf, H, W,
                                  gauss_sigma=4.0, train=False,
                                  tile_h=32, interpret=True,
                                  layout="nhwc")
    packed = rasterize_frames_fused(None, coords, conf, H, W,
                                    gauss_sigma=4.0, train=False,
                                    tile_h=32, interpret=True,
                                    layout="packed")
    want = np.asarray(space_to_depth(nhwc["label"]))
    assert packed["label"].shape == (2, H // 2, W // 2, 88)
    np.testing.assert_allclose(np.asarray(packed["label"]), want,
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(packed["mask"]),
                                  np.asarray(nhwc["mask"]))


def test_no_mask_emission_same_label():
    # emit_masks=False (serving): label identical, masks absent
    coords, conf = _random_frames(2, seed=8)
    for layout in ("nhwc", "packed"):
        full = rasterize_frames_fused(None, coords, conf, H, W,
                                      train=False, tile_h=32,
                                      interpret=True, layout=layout)
        slim = rasterize_frames_fused(None, coords, conf, H, W,
                                      train=False, tile_h=32,
                                      interpret=True, layout=layout,
                                      emit_masks=False)
        assert set(slim) == {"label"}
        np.testing.assert_array_equal(np.asarray(slim["label"]),
                                      np.asarray(full["label"]))


def test_packed_train_path_matches_jnp():
    # the train-path RNG tables are shared, so the packed label must be
    # s2d of the jnp path's assembled label under the same key
    coords, conf = _random_frames(1, seed=7)
    key = jax.random.PRNGKey(13)
    ref = R.rasterize_frames(key, coords, conf, H, W, train=True)
    got = rasterize_frames_fused(key, coords, conf, H, W, train=True,
                                 tile_h=32, interpret=True,
                                 layout="packed")
    from renderloom.models.fastpath import depth_to_space
    lbl = np.asarray(depth_to_space(got["label"]))
    skel = np.transpose(np.asarray(ref["skeleton"]), (0, 2, 3, 1))
    heat = np.transpose(np.asarray(ref["heatmaps"]), (0, 2, 3, 1))
    want = np.concatenate([skel * 2.0 - 1.0, heat], axis=-1)
    np.testing.assert_allclose(lbl, want, atol=1e-5)
