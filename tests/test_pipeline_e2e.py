"""End-to-end pipeline test: train tiny models, then run the single
pipeline command (poses → motion upsample → flow backgrounds →
autoregressive render → frames), mirroring SURVEY.md §4's "tiny clip
through both stages" integration seam."""

import json
import os

import numpy as np
import pytest
from PIL import Image

H, W = 64, 96


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    root = tmp_path_factory.mktemp("clip")
    frames = root / "frames"
    poses = root / "poses"
    frames.mkdir()
    poses.mkdir()
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:H, 0:W]
    for k in range(4):
        cx, cy = 20 + 15 * k, 30
        img = np.zeros((H, W, 3), np.uint8)
        img[..., 0] = (np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / 80.0))
                       * 255).astype(np.uint8)
        img[..., 1] = 60
        Image.fromarray(img).save(frames / f"{k:05d}.png")
        pts = []
        for _ in range(25):
            pts += [float(cx + rng.uniform(-8, 8)),
                    float(cy + rng.uniform(-12, 12)), 0.9]
        person = {
            "pose_keypoints_2d": pts,
            "hand_left_keypoints_2d": [float(cx - 5), float(cy + 4),
                                       0.9] * 21,
            "hand_right_keypoints_2d": [float(cx + 5), float(cy + 4),
                                        0.9] * 21,
        }
        with open(poses / f"{k:05d}_keypoints.json", "w") as f:
            json.dump({"version": 1.3, "people": [person]}, f)
    return root


@pytest.fixture(scope="module")
def checkpoints(tmp_path_factory):
    """One-step-trained tiny motion + renderer checkpoints."""
    import jax

    from renderloom.core import checkpoint as ckpt
    from renderloom.core.config import (DiscriminatorConfig, EmbedConfig,
                                        GeneratorConfig, MaskNetConfig,
                                        MotionConfig, MotionDatasetConfig,
                                        PatchDiscConfig, PosEncodeConfig,
                                        RendererConfig, RendererDataConfig,
                                        TransformerConfig)
    from renderloom.train.gan import create_gan_state
    from renderloom.train.motion import create_motion_state

    root = tmp_path_factory.mktemp("ckpts")
    mcfg = MotionConfig(
        transformer=TransformerConfig(hidden_dim=32, nheads=4,
                                      dim_feedforward=64, enc_layers=2,
                                      dec_layers=2, dropout=0.0),
        pos_encode=PosEncodeConfig(hidden_dim=32),
        dataset=MotionDatasetConfig(max_seq_length=33,
                                    train_sample_rate=8,
                                    train_sample_size=8, noise_rate=2,
                                    joint_drop_rate=2, flip_rate=1))
    _, _, m_state = create_motion_state(jax.random.PRNGKey(0), mcfg)
    ckpt.save_checkpoint(str(root / "motion"), 0,
                         jax.device_get(m_state))

    rcfg = RendererConfig(
        gen=GeneratorConfig(
            num_filters=4, max_num_filters=16, num_layers=6,
            num_downsamples=4, do_checkpoint=False,
            mask=MaskNetConfig(num_filters=4, max_num_filters=16,
                               num_downsamples=3, num_res_blocks=1),
            embed=EmbedConfig(num_filters=4, max_num_filters=16,
                              num_downsamples=4)),
        dis=DiscriminatorConfig(
            image=PatchDiscConfig(num_filters=4, max_num_filters=16,
                                  num_discriminators=1, num_layers=2),
            use_face=False, use_hand=False),
        data=RendererDataConfig(model_width=W, model_height=H,
                                load_width=W, load_height=H))
    _, _, _, r_state = create_gan_state(jax.random.PRNGKey(1), rcfg,
                                        height=H, width=W)
    ckpt.save_checkpoint(str(root / "renderer"), 0,
                         jax.device_get(r_state))
    return root, mcfg, rcfg


def _dump_yaml(cfg_obj, path):
    import dataclasses

    import yaml
    with open(path, "w") as f:
        yaml.safe_dump(dataclasses.asdict(cfg_obj), f)


def test_pipeline_end_to_end(clip, checkpoints, tmp_path):
    from renderloom.cli.pipeline import main

    root, mcfg, rcfg = checkpoints
    m_yaml = str(tmp_path / "m.yaml")
    r_yaml = str(tmp_path / "r.yaml")
    _dump_yaml(mcfg, m_yaml)
    _dump_yaml(rcfg, r_yaml)
    out = tmp_path / "out"
    main(["--frames-dir", str(clip / "frames"),
          "--pose-dir", str(clip / "poses"),
          "--motion-ckpt", str(root / "motion"),
          "--renderer-ckpt", str(root / "renderer"),
          "--motion-config", m_yaml, "--renderer-config", r_yaml,
          "--out-dir", str(out), "--rate", "2"])
    gen = sorted(os.listdir(out / "Generated_frames"))
    assert len(gen) == 7          # (4-1)*2+1
    poses = sorted(os.listdir(out / "Predict_motion"))
    assert len(poses) == 7
    img = np.asarray(Image.open(out / "Generated_frames" / gen[1]))
    assert img.shape == (H, W, 3)
    # keyframes pass straight through the rollout → frame 0 equals input
    key0 = np.asarray(
        Image.open(clip / "frames" / "00000.png").convert("RGB"),
        dtype=np.int16)
    out0 = np.asarray(Image.open(out / "Generated_frames" / gen[0]),
                      dtype=np.int16)
    assert np.abs(out0 - key0).mean() < 3.0