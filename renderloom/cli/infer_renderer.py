"""Render high-FPS frames from keyframes + upsampled poses.

Counterpart of ``Pose_Guided_Neural_Rendering/inference.py:11-47``:
``--input-dir`` holds ``inputs/`` (low-FPS keyframes), ``DAIN/``
(per-frame warped backgrounds) and ``Predict_motion/`` (upsampled
openpose JSONs from the motion stage); fused frames are written to
``Generated_frames/``.  If ``DAIN/`` is missing, backgrounds are
synthesized in-framework with the flow interpolator
(``renderloom.ops.flow`` — the DAIN-stage replacement).

Usage:
  python -m renderloom.cli.infer_renderer --ckpt runs/renderer/ckpt \
      --input-dir example/test
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from renderloom.core import checkpoint as ckpt
from renderloom.core.config import RendererConfig, load_renderer_config
from renderloom.eval.render_eval import render_folder
from renderloom.train.gan import create_gan_state


def load_flow_interp(flow_ckpt: str, flow_config: str = None,
                     height: int = 256, width: int = 384):
    """Restore the learned flow backend → ``interp_fn(a, b, t)``.

    The UNet is resolution-agnostic at inference apart from the
    2^levels divisibility, so ``height``/``width`` only shape the init."""
    from renderloom.core.config import FlowConfig, load_flow_config
    from renderloom.models.flownet import make_learned_interp
    from renderloom.train.flow import create_flow_state

    cfg = load_flow_config(flow_config) if flow_config else FlowConfig()
    model, _, state = create_flow_state(jax.random.PRNGKey(0), cfg,
                                        height, width)
    state = ckpt.restore_checkpoint(flow_ckpt, target=state)
    return make_learned_interp(model, state.params,
                               max_disp=cfg.max_disp)


def synthesize_backgrounds(input_dir: str, dain_dir: str, rate: int,
                           interp_fn=None):
    """Fill a DAIN/-equivalent folder with flow-interpolated frames
    (LK backend by default; pass ``interp_fn`` for the learned one)."""
    import jax.numpy as jnp
    from PIL import Image

    from renderloom.ops.flow import upsample_background

    keys = sorted(f for f in os.listdir(input_dir)
                  if f.lower().endswith((".png", ".jpg", ".jpeg")))
    frames = np.stack([
        np.asarray(Image.open(os.path.join(input_dir, f)).convert("RGB"))
        for f in keys]).astype(np.float32) / 255.0
    dense = upsample_background(jnp.asarray(frames), rate,
                                interp_fn=interp_fn)
    os.makedirs(dain_dir, exist_ok=True)
    arr = np.asarray(jnp.clip(dense, 0, 1) * 255).astype(np.uint8)
    for i in range(arr.shape[0]):
        Image.fromarray(arr[i]).save(
            os.path.join(dain_dir, f"{i:05d}.png"))
    return arr.shape[0]


def main(argv=None):
    p = argparse.ArgumentParser(description="renderloom renderer inference")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--input-dir", type=str, required=True)
    p.add_argument("--out-name", type=str, default="Generated_frames")
    p.add_argument("--clip", type=str, default=None,
                   help="process one clip subfolder only")
    p.add_argument("--upsample-rate", type=int, default=4,
                   help="used when synthesizing missing backgrounds")
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--flow-ckpt", type=str, default=None,
                   help="learned flow checkpoint for background "
                        "synthesis (default: pyramidal LK)")
    p.add_argument("--flow-config", type=str, default=None)
    args = p.parse_args(argv)

    from renderloom.core.cache import enable_compile_cache
    enable_compile_cache()

    cfg = load_renderer_config(args.config) if args.config \
        else RendererConfig()
    gen, dis, txs, state = create_gan_state(jax.random.PRNGKey(args.seed),
                                            cfg)
    state = ckpt.restore_checkpoint(args.ckpt, target=state)
    print(f"loaded renderer checkpoint at step {int(state.step)}")

    inputs_root = os.path.join(args.input_dir, "inputs")
    dain_root = os.path.join(args.input_dir, "DAIN")
    pose_root = os.path.join(args.input_dir, "Predict_motion")
    out_root = os.path.join(args.input_dir, args.out_name)

    clips = [args.clip] if args.clip else sorted(
        f for f in os.listdir(inputs_root)
        if os.path.isdir(os.path.join(inputs_root, f)))
    if not clips:
        clips = [""]

    interp_fn = load_flow_interp(args.flow_ckpt, args.flow_config) \
        if args.flow_ckpt else None

    for clip in clips:
        input_dir = os.path.join(inputs_root, clip)
        dain_dir = os.path.join(dain_root, clip)
        pose_dir = os.path.join(pose_root, clip)
        out_dir = os.path.join(out_root, clip)
        if not os.path.isdir(dain_dir) or not os.listdir(dain_dir):
            print(f"clip {clip or '.'}: no DAIN folder — synthesizing "
                  "backgrounds with the flow interpolator")
            n = synthesize_backgrounds(input_dir, dain_dir,
                                       args.upsample_rate, interp_fn)
            print(f"  wrote {n} background frames")
        n = render_folder(gen, state, cfg, input_dir, dain_dir, pose_dir,
                          out_dir)
        print(f"clip {clip or '.'}: wrote {n} frames to {out_dir}")


if __name__ == "__main__":
    main()
