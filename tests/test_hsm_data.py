"""HumanSloMo data pipeline: synthetic h5 round-trip + on-device prep.

Builds a tiny reference-layout HumanSlomo.h5 (vlen PNG bytes +
float64 poses, ``HumanSloMo_Dataset/lib/gen_dataset_h5.py:57-174``) and
drives the reader and the jitted window preparation.
"""

import io
import os

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from renderloom.core.config import RendererDataConfig
from renderloom.data.hsm import HsmReader, prepare_batch, prepare_window

H0, W0 = 64, 96          # stored frame size
CFG = RendererDataConfig(load_width=96, load_height=64, model_width=96,
                         model_height=64, gauss_sigma=3.0)


def png_bytes(arr: np.ndarray) -> np.ndarray:
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return np.frombuffer(buf.getvalue(), dtype=np.uint8)


@pytest.fixture(scope="module")
def hsm_h5(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("hsm") / "HumanSlomo.h5")
    rng = np.random.default_rng(0)
    with h5py.File(path, "w") as f:
        dt = h5py.special_dtype(vlen=np.uint8)
        for vid, n in (("clip_a", 6), ("test_a", 5)):
            grp = f.create_group(vid)
            prefix = "train" if vid.startswith("clip") else "gt"
            imgs = grp.create_dataset(f"{prefix}_images", (n,), dtype=dt)
            dains = grp.create_dataset(f"{prefix}_dain", (n,), dtype=dt)
            poses = np.zeros((n, 19, 3))
            for i in range(n):
                frame = rng.integers(0, 255, (H0, W0, 3), dtype=np.uint8)
                imgs[i] = png_bytes(frame)
                dains[i] = png_bytes((frame // 2).astype(np.uint8))
                poses[i, :, 0] = np.linspace(20, 70, 19) + i
                poses[i, :, 1] = np.linspace(10, 55, 19)
                poses[i, :, 2] = 0.9
            grp.create_dataset(f"{prefix}_poses", data=poses)
    return path


def test_reader_windows(hsm_h5):
    reader = HsmReader(hsm_h5, ["clip_a"], "train", max_frames=4)
    assert len(reader) == 3          # 6 frames → 3 windows of 4
    w = reader.read_window("clip_a", 0)
    assert w["images"].shape == (4, H0, W0, 3)
    assert w["dain"].shape == (4, H0, W0, 3)
    assert w["poses"].shape == (4, 19, 3)
    # frame 0 background is zeros; frame i uses dain[i-1]
    assert w["dain"][0].max() == 0
    assert w["dain"][1].max() > 0


def test_reader_curriculum(hsm_h5):
    reader = HsmReader(hsm_h5, ["clip_a"], "train", max_frames=4)
    reader.set_max_frames(5)
    assert reader.max_frames == 5
    assert len(reader) == 2


def test_prepare_window_shapes_train(hsm_h5):
    reader = HsmReader(hsm_h5, ["clip_a"], "train", max_frames=4)
    w = reader.read_window("clip_a", 1)
    out = prepare_window(jax.random.PRNGKey(0),
                         jnp.asarray(w["images"]), jnp.asarray(w["dain"]),
                         jnp.asarray(w["poses"]), CFG, train=True)
    assert out["label"].shape == (4, 64, 96, 22)
    assert out["image"].shape == (4, 64, 96, 3)
    assert out["back"].shape == (4, 64, 96, 3)
    assert out["fg_mask"].shape == (4, 64, 96, 1)
    img = np.asarray(out["image"])
    assert img.min() >= -1.0 and img.max() <= 1.0
    # skeleton channels are [-1,1], heatmaps [0,1]
    lbl = np.asarray(out["label"])
    assert lbl[..., :3].min() >= -1.0
    assert lbl[..., 3:].min() >= 0.0 and lbl[..., 3:].max() <= 1.0
    # the pose is inside the frame → some foreground
    assert np.asarray(out["fg_mask"]).sum() > 0


def test_prepare_window_eval_deterministic(hsm_h5):
    reader = HsmReader(hsm_h5, ["test_a"], "test", max_frames=3)
    w = reader.read_window("test_a", 0)
    a = prepare_window(None, jnp.asarray(w["images"]),
                       jnp.asarray(w["dain"]), jnp.asarray(w["poses"]),
                       CFG, train=False)
    b = prepare_window(None, jnp.asarray(w["images"]),
                       jnp.asarray(w["dain"]), jnp.asarray(w["poses"]),
                       CFG, train=False)
    np.testing.assert_array_equal(np.asarray(a["label"]),
                                  np.asarray(b["label"]))
    # frame 0 background forced to exact zeros (HSM_auto_dataset.py:148)
    assert float(np.abs(np.asarray(a["back"][0])).max()) == 0.0


def test_prepare_batch_jit(hsm_h5):
    reader = HsmReader(hsm_h5, ["clip_a"], "train", max_frames=4)
    rng = np.random.default_rng(0)
    batch = next(reader.batches(rng, 2))

    @jax.jit
    def prep(key, images, dain, poses):
        return prepare_batch(key, {"images": images, "dain": dain,
                                   "poses": poses}, CFG, train=True)

    out = prep(jax.random.PRNGKey(1), jnp.asarray(batch["images"]),
               jnp.asarray(batch["dain"]),
               jnp.asarray(batch["poses"].astype(np.float32)))
    assert out["label"].shape == (2, 4, 64, 96, 22)
    assert np.isfinite(np.asarray(out["label"])).all()


def test_eval_identity_skip_matches_warp():
    """Deterministic prep at src==load==model skips the affine warp; the
    skipped path must equal the explicit identity warp bit-near-exactly
    (bilinear at integer coordinates)."""
    from renderloom.ops import image as img_ops

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (3, H0, W0, 3)).astype(np.float32)
    dain = rng.integers(0, 255, (3, H0, W0, 3)).astype(np.float32)
    poses = np.concatenate(
        [rng.uniform(5, 60, (3, 19, 2)), rng.uniform(0.5, 1, (3, 19, 1))],
        axis=-1).astype(np.float32)
    out = prepare_window(None, jnp.asarray(imgs), jnp.asarray(dain),
                         jnp.asarray(poses), CFG, train=False)

    m = img_ops.resize_matrix(H0, W0, H0, W0)
    to_unit = lambda x: x / 127.5 - 1.0
    warped = jax.vmap(lambda im: img_ops.affine_warp(im, m, H0, W0))(
        to_unit(jnp.asarray(imgs)))
    np.testing.assert_allclose(np.asarray(out["image"]),
                               np.asarray(warped), atol=1e-5)

    # fused path agrees with the vmap path under the skip too
    batch = {"images": jnp.asarray(imgs)[None],
             "dain": jnp.asarray(dain)[None],
             "poses": jnp.asarray(poses)[None]}
    fused = prepare_batch(None, batch, CFG, train=False, fused_raster=True)
    np.testing.assert_allclose(np.asarray(fused["image"][0]),
                               np.asarray(out["image"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fused["label"][0]),
                               np.asarray(out["label"]), atol=5e-3)


def test_eval_disk_resolution_separable_matches_warp():
    """Deterministic prep at src != model size (the reference's on-disk
    768x512 frames, lib/gen_dataset.py:36) now routes through the
    separable MXU resize; it must match the general affine-warp path it
    replaced, on both the vmap and the fused-raster branch."""
    from renderloom.ops import image as img_ops

    sh, sw = 2 * H0, 2 * W0                      # "disk" resolution
    rng = np.random.default_rng(7)
    imgs = rng.integers(0, 255, (3, sh, sw, 3)).astype(np.float32)
    dain = rng.integers(0, 255, (3, sh, sw, 3)).astype(np.float32)
    poses = np.concatenate(
        [rng.uniform(5, 120, (3, 19, 2)), rng.uniform(0.5, 1, (3, 19, 1))],
        axis=-1).astype(np.float32)

    out = prepare_window(None, jnp.asarray(imgs), jnp.asarray(dain),
                         jnp.asarray(poses), CFG, train=False)

    m = img_ops.resize_matrix(sh, sw, CFG.load_height, CFG.load_width)
    to_unit = lambda x: x / 127.5 - 1.0
    ref_img = jax.vmap(lambda im: img_ops.affine_warp(
        im, m, CFG.model_height, CFG.model_width))(to_unit(jnp.asarray(imgs)))
    np.testing.assert_allclose(np.asarray(out["image"]),
                               np.asarray(ref_img), atol=1e-5)
    # keypoints ride the same forward affine
    ref_kp = jax.vmap(lambda p: img_ops.transform_keypoints(p[:, :2], m))(
        jnp.asarray(poses))
    # the label stream is built from coords; spot-check via the direct
    # prep output of a window fed pre-scaled coordinates
    pre = prepare_window(None, jnp.asarray(
        np.asarray(out["image"] * 127.5 + 127.5)), jnp.asarray(
        np.asarray((out["back"] + 1) * 127.5)), jnp.concatenate(
        [np.asarray(ref_kp), poses[:, :, 2:]], axis=-1), CFG, train=False)
    np.testing.assert_allclose(np.asarray(out["label"]),
                               np.asarray(pre["label"]), atol=1e-4)

    # fused branch agrees with the vmap branch
    batch = {"images": jnp.asarray(imgs)[None],
             "dain": jnp.asarray(dain)[None],
             "poses": jnp.asarray(poses)[None]}
    fused = prepare_batch(None, batch, CFG, train=False, fused_raster=True)
    np.testing.assert_allclose(np.asarray(fused["image"][0]),
                               np.asarray(out["image"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fused["label"][0]),
                               np.asarray(out["label"]), atol=5e-3)
