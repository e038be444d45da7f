"""Fused-rasterizer batch prep must match the vmapped jnp path on the
deterministic eval path (train randomness differs only in RNG layout)."""

import jax
import jax.numpy as jnp
import numpy as np

from renderloom.core.config import RendererDataConfig
from renderloom.data.hsm import prepare_batch

CFG = RendererDataConfig(load_width=96, load_height=64, model_width=96,
                         model_height=64, gauss_sigma=3.0)


def _batch(B=2, F=3):
    rng = np.random.default_rng(0)
    poses = np.zeros((B, F, 19, 3), np.float32)
    poses[..., 0] = rng.uniform(10, 86, (B, F, 19))
    poses[..., 1] = rng.uniform(10, 54, (B, F, 19))
    poses[..., 2] = 0.9
    return {
        "images": jnp.asarray(rng.integers(0, 255, (B, F, 64, 96, 3),
                                           dtype=np.uint8)),
        "dain": jnp.asarray(rng.integers(0, 255, (B, F, 64, 96, 3),
                                         dtype=np.uint8)),
        "poses": jnp.asarray(poses),
    }


def test_fused_prepare_matches_eval_path():
    batch = _batch()
    plain = prepare_batch(None, batch, CFG, train=False)
    fused = prepare_batch(None, batch, CFG, train=False,
                          fused_raster=True)
    np.testing.assert_allclose(np.asarray(fused["image"]),
                               np.asarray(plain["image"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fused["label"]),
                               np.asarray(plain["label"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fused["back"]),
                               np.asarray(plain["back"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fused["fg_mask"]),
                               np.asarray(plain["fg_mask"]), atol=1e-5)


def test_prepare_packed_and_maskless_serving_form():
    # the serving prep form: packed label, no fg_mask — label must be
    # the space_to_depth of the standard fused label on both paths
    from renderloom.models.fastpath import space_to_depth
    batch = _batch()
    full = prepare_batch(None, batch, CFG, train=False,
                         fused_raster=True)
    want = np.asarray(space_to_depth(
        full["label"].reshape((-1,) + full["label"].shape[2:])
    ).reshape((2, 3, 32, 48, 88)))
    for fused in (True, False):
        slim = prepare_batch(None, batch, CFG, train=False,
                             fused_raster=fused, packed_label=True,
                             want_masks=False)
        assert "fg_mask" not in slim
        np.testing.assert_allclose(np.asarray(slim["label"]), want,
                                   atol=1e-5)


def test_fused_prepare_train_runs():
    batch = _batch(1, 3)
    out = prepare_batch(jax.random.PRNGKey(0), batch, CFG, train=True,
                        fused_raster=True)
    assert out["label"].shape == (1, 3, 64, 96, 22)
    assert np.isfinite(np.asarray(out["label"])).all()
