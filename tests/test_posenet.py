"""Pose head: soft-argmax decode oracle + training smoke on synthetic
blob images (keypoint error must shrink well below the image scale)."""

import jax
import jax.numpy as jnp
import numpy as np

from renderloom.core.config import PoseNetConfig
from renderloom.models.posenet import (N_JOINTS, STRIDE,
                                       decode_heatmaps)
from renderloom.train.pose import (create_pose_state,
                                   make_pose_train_step)

H, W = 64, 64


def small_cfg():
    return PoseNetConfig(base_filters=16, blocks=2, lr=2e-3,
                         batch_size=4, sigma=6.0)


def test_decode_recovers_peak_location():
    h, w = H // STRIDE, W // STRIDE
    logits = np.full((1, h, w, N_JOINTS), -8.0, np.float32)
    ys = [3, 7, 11]
    xs = [2, 9, 14]
    for j in range(N_JOINTS):
        logits[0, ys[j % 3], xs[j % 3], j] = 8.0
    kps, conf = decode_heatmaps(jnp.asarray(logits))
    kps = np.asarray(kps)
    for j in range(N_JOINTS):
        assert abs(kps[0, j, 0] - (xs[j % 3] + 0.5) * STRIDE) < 1.0
        assert abs(kps[0, j, 1] - (ys[j % 3] + 0.5) * STRIDE) < 1.0
    assert (np.asarray(conf) > 0.9).all()


def _blob_batch(rng, batch):
    """Images whose channels carry gaussian blobs at the keypoints —
    learnable pose structure without real data."""
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    imgs = np.zeros((batch, H, W, 3), np.float32)
    poses = np.zeros((batch, N_JOINTS, 3), np.float32)
    for b in range(batch):
        base = rng.uniform(16, 48, 2)
        for j in range(N_JOINTS):
            cx = np.clip(base[0] + 10 * np.cos(2 * np.pi * j / N_JOINTS),
                         4, W - 4)
            cy = np.clip(base[1] + 10 * np.sin(2 * np.pi * j / N_JOINTS),
                         4, H - 4)
            blob = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / 18.0)
            imgs[b, :, :, j % 3] += blob
            poses[b, j] = (cx, cy, 0.9)
    return {"images": np.clip(imgs, 0, 1), "poses": poses}


def test_training_smoke_keypoint_error_shrinks():
    cfg = small_cfg()
    model, tx, state = create_pose_state(jax.random.PRNGKey(0), cfg, H, W)
    step = make_pose_train_step(model, tx, cfg)
    rng = np.random.default_rng(0)

    def kp_error(params, batch):
        logits = model.apply({"params": params},
                             jnp.asarray(batch["images"]))
        kps, _ = decode_heatmaps(logits)
        return float(jnp.mean(jnp.abs(kps - batch["poses"][..., :2])))

    test_batch = _blob_batch(np.random.default_rng(99), 2)
    err0 = kp_error(state.params, test_batch)
    for _ in range(60):
        state, metrics = step(state, _blob_batch(rng, cfg.batch_size))
    err1 = kp_error(state.params, test_batch)
    assert np.isfinite(float(metrics["loss/total"]))
    assert err1 < err0 * 0.5, (err0, err1)
    assert err1 < 6.0, err1   # within ~1.5 heatmap cells


def test_random_erase_occludes_and_varies():
    from renderloom.train.pose import random_erase
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.uniform(0, 1, (3, 32, 48, 3)), jnp.float32)
    out = random_erase(jax.random.PRNGKey(0), imgs, count=2, rate=1.0,
                       frac=0.4)
    changed = np.mean(np.any(np.asarray(out) != np.asarray(imgs), -1),
                      axis=(1, 2))
    assert np.all(changed > 0.005), changed       # boxes really drawn
    assert np.all(changed < 0.6), changed         # ...but bounded
    # occluded pixels are flat per image (single fill color per box)
    out2 = random_erase(jax.random.PRNGKey(7), imgs, count=2, rate=1.0,
                        frac=0.4)
    assert np.any(np.asarray(out2) != np.asarray(out))  # key-dependent
    # rate=0 is the identity
    same = random_erase(jax.random.PRNGKey(0), imgs, count=2, rate=0.0,
                        frac=0.4)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(imgs))


def test_training_step_with_occlusion_aug_runs():
    import dataclasses
    cfg = dataclasses.replace(small_cfg(), occlude_rate=0.7)
    model, tx, state = create_pose_state(jax.random.PRNGKey(0), cfg,
                                         H, W)
    step = make_pose_train_step(model, tx, cfg)
    rng = np.random.default_rng(0)
    for _ in range(2):
        state, metrics = step(state, _blob_batch(rng, cfg.batch_size))
    assert np.isfinite(float(metrics["loss/total"]))


def test_extract_openpose_roundtrip(tmp_path):
    """extract_pose JSONs must parse through the framework's own
    openpose reader (the AlphaPose ingestion contract)."""
    from PIL import Image

    from renderloom.cli.extract_pose import extract_folder
    from renderloom.data.openpose import read_openpose_dir
    from renderloom.train.pose import create_pose_state

    cfg = small_cfg()
    model, _, state = create_pose_state(jax.random.PRNGKey(0), cfg, H, W)
    frames = tmp_path / "frames"
    frames.mkdir()
    rng = np.random.default_rng(0)
    for k in range(3):
        Image.fromarray(rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
                        ).save(frames / f"{k:03d}.png")
    out = tmp_path / "poses"
    n = extract_folder(model, state.params, str(frames), str(out), H, W,
                       batch=2)
    assert n == 3
    motion, conf, _ = read_openpose_dir(str(out), scale=1.0, offset=0.0)
    assert motion.shape == (19, 2, 3)
    assert np.isfinite(motion).all()
