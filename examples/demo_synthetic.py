"""Self-contained renderloom demo — no datasets, no checkpoints needed.

Generates a tiny synthetic clip (a moving blob + matching openpose
JSONs), initializes tiny models, runs the FULL pipeline (motion
upsampling → flow backgrounds → autoregressive SPADE rollout) and writes
the interpolated frames + a GIF under ``./demo_out``.

  JAX_PLATFORMS=cpu python examples/demo_synthetic.py   (~2 min on CPU)

For the real workflow (datasets, training, checkpoints) see
``examples/README.md``.
"""

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

H, W = 64, 96
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "demo_out")


def make_clip(root):
    from PIL import Image

    frames = os.path.join(root, "frames")
    poses = os.path.join(root, "poses")
    os.makedirs(frames, exist_ok=True)
    os.makedirs(poses, exist_ok=True)
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:H, 0:W]
    for k in range(4):
        cx, cy = 20 + 15 * k, 30
        img = np.zeros((H, W, 3), np.uint8)
        img[..., 0] = (np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / 80.0))
                       * 255).astype(np.uint8)
        img[..., 1] = 60
        Image.fromarray(img).save(f"{frames}/{k:05d}.png")
        pts = []
        for _ in range(25):
            pts += [float(cx + rng.uniform(-8, 8)),
                    float(cy + rng.uniform(-12, 12)), 0.9]
        person = {"pose_keypoints_2d": pts,
                  "hand_left_keypoints_2d":
                      [float(cx - 5), float(cy + 4), 0.9] * 21,
                  "hand_right_keypoints_2d":
                      [float(cx + 5), float(cy + 4), 0.9] * 21}
        with open(f"{poses}/{k:05d}_keypoints.json", "w") as f:
            json.dump({"version": 1.3, "people": [person]}, f)
    return frames, poses


def make_checkpoints(root):
    import jax

    from renderloom.core import checkpoint as ckpt
    from renderloom.core.config import (DiscriminatorConfig, EmbedConfig,
                                        GeneratorConfig, MaskNetConfig,
                                        MotionConfig, MotionDatasetConfig,
                                        PatchDiscConfig, PosEncodeConfig,
                                        RendererConfig,
                                        RendererDataConfig,
                                        TransformerConfig)
    from renderloom.train.gan import create_gan_state
    from renderloom.train.motion import create_motion_state

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
    ckpt.save_checkpoint(os.path.join(root, "motion"), 0,
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
    ckpt.save_checkpoint(os.path.join(root, "renderer"), 0,
                         jax.device_get(r_state))

    import yaml
    m_yaml = os.path.join(root, "motion.yaml")
    r_yaml = os.path.join(root, "renderer.yaml")
    with open(m_yaml, "w") as f:
        yaml.safe_dump(dataclasses.asdict(mcfg), f)
    with open(r_yaml, "w") as f:
        yaml.safe_dump(dataclasses.asdict(rcfg), f)
    return m_yaml, r_yaml


def main():
    from renderloom.core.cache import enable_compile_cache
    enable_compile_cache()      # also honors JAX_PLATFORMS
    os.makedirs(OUT, exist_ok=True)
    frames, poses = make_clip(OUT)
    m_yaml, r_yaml = make_checkpoints(OUT)

    from renderloom.cli.pipeline import main as pipeline

    pipeline(["--frames-dir", frames, "--pose-dir", poses,
              "--motion-ckpt", os.path.join(OUT, "motion"),
              "--renderer-ckpt", os.path.join(OUT, "renderer"),
              "--motion-config", m_yaml, "--renderer-config", r_yaml,
              "--out-dir", os.path.join(OUT, "result"), "--rate", "2",
              "--video", os.path.join(OUT, "result", "demo.mp4")])
    print(f"\ndemo output in {OUT}/result (frames + video)")


if __name__ == "__main__":
    main()
