"""End-to-end clip interpolation: frames + poses → high-FPS video.

The reference has no single entry point — a user must run three repos in
sequence (AlphaPose → Human_Motion_Modelling/inference.py → DAIN →
Pose_Guided_Neural_Rendering/inference.py, README.md:12-48).  renderloom
fuses the in-framework stages into one command:

  1. motion upsampling: low-FPS openpose JSONs → dense pose JSONs
     (``renderloom.eval.motion_infer``);
  2. background synthesis: flow-interpolated keyframes
     (``renderloom.ops.flow`` — the DAIN replacement);
  3. autoregressive rendering: pose-conditioned SPADE rollout with soft
     compositing (``renderloom.eval.render_eval.render_folder``);
  4. optional mp4/gif export (imageio).

Pose extraction stays external (AlphaPose JSON contract, SURVEY.md §2.4).

Usage:
  python -m renderloom.cli.pipeline --frames-dir clip/frames \
      --pose-dir clip/poses --motion-ckpt runs/motion/ckpt \
      --renderer-ckpt runs/renderer/ckpt --out-dir clip/out --rate 4
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(
        description="renderloom end-to-end interpolation")
    p.add_argument("--frames-dir", type=str, required=True,
                   help="low-FPS keyframe images")
    p.add_argument("--pose-dir", type=str, default=None,
                   help="low-FPS openpose JSONs for the same frames "
                        "(omit to extract them with --pose-ckpt)")
    p.add_argument("--pose-ckpt", type=str, default=None,
                   help="in-framework pose-head checkpoint: extracts "
                        "poses from --frames-dir when --pose-dir is "
                        "not given (stage 0)")
    p.add_argument("--pose-config", type=str, default=None)
    p.add_argument("--motion-ckpt", type=str, required=True)
    p.add_argument("--renderer-ckpt", type=str, required=True)
    p.add_argument("--motion-config", type=str, default=None)
    p.add_argument("--renderer-config", type=str, default=None)
    p.add_argument("--out-dir", type=str, required=True)
    p.add_argument("--rate", type=int, default=4,
                   help="upsampling factor (power of two)")
    p.add_argument("--video", type=str, default=None,
                   help="optional output mp4 path")
    p.add_argument("--fps", type=int, default=30)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--flow-ckpt", type=str, default=None,
                   help="learned flow checkpoint for stage 2 "
                        "(default: pyramidal LK)")
    p.add_argument("--flow-config", type=str, default=None)
    args = p.parse_args(argv)

    from renderloom.core.cache import enable_compile_cache
    enable_compile_cache()

    from renderloom.cli.infer_renderer import synthesize_backgrounds
    from renderloom.core import checkpoint as ckpt
    from renderloom.core.config import (MotionConfig, RendererConfig,
                                        load_motion_config,
                                        load_renderer_config)
    from renderloom.data.amass import load_or_compute_stats
    from renderloom.eval.motion_infer import MotionInterpolator
    from renderloom.eval.render_eval import render_folder
    from renderloom.train.gan import create_gan_state
    from renderloom.train.motion import create_motion_state

    os.makedirs(args.out_dir, exist_ok=True)

    # ---- stage 0 (optional): in-framework pose extraction -----------
    pose_dir = args.pose_dir
    if pose_dir is None:
        if not args.pose_ckpt:
            raise SystemExit(
                "either --pose-dir (external openpose JSONs) or "
                "--pose-ckpt (in-framework pose head) is required")
        from renderloom.cli.extract_pose import extract_folder
        from renderloom.core.config import (PoseNetConfig,
                                            load_pose_config)
        from renderloom.train.pose import create_pose_state

        pcfg = load_pose_config(args.pose_config) if args.pose_config \
            else PoseNetConfig()
        p_model, _, p_state = create_pose_state(
            jax.random.PRNGKey(args.seed), pcfg)
        p_state = ckpt.restore_checkpoint(args.pose_ckpt,
                                          target=p_state)
        pose_dir = os.path.join(args.out_dir, "poses")
        n = extract_folder(p_model, p_state.params, args.frames_dir,
                           pose_dir, 256, 384)
        print(f"pose: extracted {n} openpose JSONs to {pose_dir}")

    # ---- stage 1: motion upsampling ---------------------------------
    mcfg = load_motion_config(args.motion_config) if args.motion_config \
        else MotionConfig()
    m_model, _, m_state = create_motion_state(
        jax.random.PRNGKey(args.seed), mcfg)
    m_state = ckpt.restore_checkpoint(args.motion_ckpt, target=m_state)
    try:
        mean, std = load_or_compute_stats(None, mcfg.dataset)
    except FileNotFoundError:
        mean = np.zeros((19, 2), np.float32)
        std = np.ones((19, 2), np.float32)
        print("WARNING: no motion normalization stats found")
    interp = MotionInterpolator(m_model, m_state.params, mcfg, mean, std)

    pred_dir = os.path.join(args.out_dir, "Predict_motion")
    lin_dir = os.path.join(args.out_dir, "Linear_motion")
    interp.interpolate_openpose(pose_dir, args.rate, pred_dir,
                                lin_dir)
    print(f"motion: wrote dense poses to {pred_dir}")

    # ---- stage 2: background synthesis ------------------------------
    from renderloom.cli.infer_renderer import load_flow_interp

    interp_fn = load_flow_interp(args.flow_ckpt, args.flow_config) \
        if args.flow_ckpt else None
    dain_dir = os.path.join(args.out_dir, "DAIN")
    n_back = synthesize_backgrounds(args.frames_dir, dain_dir, args.rate,
                                    interp_fn)
    print(f"background: wrote {n_back} flow-interpolated frames "
          f"({'learned' if interp_fn else 'LK'} backend)")

    # ---- stage 3: neural rendering ----------------------------------
    rcfg = load_renderer_config(args.renderer_config) \
        if args.renderer_config else RendererConfig()
    gen, _, _, r_state = create_gan_state(
        jax.random.PRNGKey(args.seed), rcfg)
    r_state = ckpt.restore_checkpoint(args.renderer_ckpt, target=r_state)
    out_frames = os.path.join(args.out_dir, "Generated_frames")
    n = render_folder(gen, r_state, rcfg, args.frames_dir, dain_dir,
                      pred_dir, out_frames)
    print(f"render: wrote {n} fused frames to {out_frames}")

    # ---- stage 4: video export --------------------------------------
    if args.video:
        from PIL import Image

        from renderloom.utils.visualize import write_video

        names = sorted(os.listdir(out_frames))
        frames = [np.asarray(Image.open(os.path.join(out_frames, f)))
                  for f in names]
        written = write_video(frames, args.video, args.fps)
        print(f"video: {written} ({len(frames)} frames @ {args.fps})")


if __name__ == "__main__":
    main()
