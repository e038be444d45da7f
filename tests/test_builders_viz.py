"""Dataset builders + visualization utilities + motion discriminator."""

import json
import os

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from renderloom.data.builders import (emit_download_script, pack_hsm_h5)
from renderloom.data.hsm import HsmReader
from renderloom.models.motion_discriminator import MotionDiscriminator
from renderloom.utils.visualize import (make_grid_video, motion2gif,
                                        print_evaluation)


def _write_clip(root, phase, img_sub, clip, n, rng):
    from PIL import Image
    img_dir = os.path.join(root, phase, img_sub, clip)
    dain_dir = os.path.join(root, phase, "DAIN", clip)
    pose_dir = os.path.join(root, phase, "poses", clip)
    for d in (img_dir, dain_dir, pose_dir):
        os.makedirs(d, exist_ok=True)
    for i in range(n):
        arr = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
        Image.fromarray(arr).save(
            os.path.join(img_dir, f"frame{i:05d}.png"))
        Image.fromarray(arr // 2).save(
            os.path.join(dain_dir, f"frame{i:05d}.png"))
        body = np.zeros((25, 3))
        body[:15, 0] = np.linspace(5, 40, 15)
        body[:15, 1] = np.linspace(5, 28, 15)
        body[:15, 2] = 0.9
        hand = np.tile([20.0, 20.0, 0.9], (21, 1))
        payload = {"people": [{
            "pose_keypoints_2d": body.reshape(-1).tolist(),
            "hand_left_keypoints_2d": hand.reshape(-1).tolist(),
            "hand_right_keypoints_2d": hand.reshape(-1).tolist(),
        }]}
        with open(os.path.join(pose_dir,
                               f"frame{i:05d}_keypoints.json"), "w") as f:
            json.dump(payload, f)


def test_pack_hsm_h5_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    root = str(tmp_path / "tree")
    _write_clip(root, "train", "frames", "clip_x", 5, rng)
    _write_clip(root, "test", "gt", "test_x", 4, rng)
    out = str(tmp_path / "HumanSlomo.h5")
    counts = pack_hsm_h5(root, out)
    assert counts == {"clip_x": 5, "test_x": 4}
    with h5py.File(out, "r") as f:
        assert f["clip_x"]["train_poses"].shape == (5, 19, 3)
        assert len(f["test_x"]["gt_images"]) == 4
    # packed file loads through the reader
    reader = HsmReader(out, ["clip_x"], "train", max_frames=3)
    w = reader.read_window("clip_x", 0)
    assert w["images"].shape == (3, 32, 48, 3)
    assert w["poses"][0, 0, 2] == pytest.approx(0.9)


def test_emit_download_script(tmp_path):
    csv_path = str(tmp_path / "video.csv")
    with open(csv_path, "w") as f:
        f.write("File_name,Youtube_id,FPS\n02_Box,abc123,30\n"
                "03_Box,def456,24\n")
    videos = str(tmp_path / "videos")
    os.makedirs(videos)
    open(os.path.join(videos, "02_Box.mp4"), "w").close()
    out = str(tmp_path / "tmp.sh")
    n = emit_download_script(csv_path, videos, out)
    assert n == 1
    text = open(out).read()
    assert "def456" in text and "abc123" not in text


def test_motion2gif(tmp_path):
    motion = np.zeros((19, 2, 4))
    motion[:, 0] = np.linspace(-0.5, 0.5, 19)[:, None]
    motion[:, 1] = np.linspace(-0.8, 0.8, 19)[:, None]
    path = motion2gif(motion, str(tmp_path / "skel.gif"), 64, 64)
    assert os.path.getsize(path) > 0


def test_make_grid_video_gif_fallback(tmp_path):
    rng = np.random.default_rng(0)
    streams = {
        "a": [rng.uniform(-1, 1, (16, 16, 3)) for _ in range(3)],
        "b": [rng.uniform(0, 1, (16, 16)) for _ in range(3)],
    }
    path = make_grid_video(streams, str(tmp_path / "grid.mp4"), fps=5)
    assert os.path.exists(path)          # mp4 or fallback gif


def test_print_evaluation_history(tmp_path):
    path = str(tmp_path / "history.txt")
    print_evaluation({"mse": 0.5}, epoch=3, history_path=path)
    assert "mse" in open(path).read()


def test_motion_discriminator_shapes():
    model = MotionDiscriminator(channels=(38, 8, 16, 32))
    x = jnp.zeros((2, 38, 33))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 1, 1, 1)     # global-pooled logit
    patch = MotionDiscriminator(channels=(38, 8, 16, 32),
                                use_patch_gan=True)
    p = patch.init(jax.random.PRNGKey(0), x)
    out = patch.apply(p, x)
    assert out.shape[0] == 2 and out.shape[-1] == 1
