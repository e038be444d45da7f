"""Upsample openpose pose folders with a trained motion transformer.

Same CLI contract as ``Human_Motion_Modelling/inference.py:83-93``:
``--pose-dir`` holds one subfolder of openpose JSONs per clip;
``Predict_motion/<clip>`` and ``Linear_motion/<clip>`` are written under
``--save-dir``.

Usage:
  python -m renderloom.cli.infer_motion --ckpt runs/motion/ckpt \
      --pose-dir example/poses --save-dir example/out --upsample-rate 8
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from renderloom.core import checkpoint as ckpt
from renderloom.core.config import MotionConfig, load_motion_config
from renderloom.data.amass import load_or_compute_stats
from renderloom.eval.motion_infer import MotionInterpolator
from renderloom.train.motion import create_motion_state


def main(argv=None):
    p = argparse.ArgumentParser(description="renderloom motion inference")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--ckpt", type=str, required=True,
                   help="checkpoint directory (orbax)")
    p.add_argument("--pose-dir", type=str, required=True,
                   help="input low-FPS pose path (subfolders of JSONs)")
    p.add_argument("--save-dir", type=str, required=True)
    p.add_argument("--upsample-rate", type=int, default=8,
                   help="insert rate-1 frames between keyframes (pow 2)")
    p.add_argument("--seed", type=int, default=123)
    args = p.parse_args(argv)

    from renderloom.core.cache import enable_compile_cache
    enable_compile_cache()

    cfg = load_motion_config(args.config) if args.config else MotionConfig()
    model, _, state = create_motion_state(jax.random.PRNGKey(args.seed),
                                          cfg)
    state = ckpt.restore_checkpoint(args.ckpt, target=state)
    print(f"loaded checkpoint at step {int(state.step)}")

    try:
        mean, std = load_or_compute_stats(None, cfg.dataset)
    except FileNotFoundError:
        print("WARNING: no normalization stats found; using zeros/ones "
              "(results will be wrong unless the model was trained so)")
        mean = np.zeros((19, 2), np.float32)
        std = np.ones((19, 2), np.float32)

    interp = MotionInterpolator(model, state.params, cfg, mean, std)

    clips = sorted(
        f for f in os.listdir(args.pose_dir)
        if os.path.isdir(os.path.join(args.pose_dir, f)))
    if not clips:
        clips = [""]          # pose-dir itself is a single clip
    for clip in clips:
        pose_path = os.path.join(args.pose_dir, clip)
        pred_dir = os.path.join(args.save_dir, "Predict_motion", clip)
        lin_dir = os.path.join(args.save_dir, "Linear_motion", clip)
        interp.interpolate_openpose(pose_path, args.upsample_rate,
                                    pred_dir, lin_dir)
        print(f"clip {clip or '.'}: wrote {pred_dir} and {lin_dir}")


if __name__ == "__main__":
    main()
