"""Export the full serving pipeline to a StableHLO artifact.

Freezes motion upsampling → flow backgrounds → label rasterization →
SPADE rollout (one program, weights embedded) for deployment without
Python tracing — see `renderloom.eval.export`.  A TPU artifact can be
built on a CPU-only host.  The reference offers no deployable form at
all: serving it means three repos + torch + CUDA (`README.md:12-48`).

Usage:
  python -m renderloom.cli.export_model \
      --motion-ckpt runs/motion/ckpt --renderer-ckpt runs/renderer/ckpt \
      --rate 4 --keyframes 8 --clips 1 --platform tpu \
      --out pipeline_tpu.rlx
"""

from __future__ import annotations

import argparse

import jax
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(
        description="renderloom serving-pipeline export")
    p.add_argument("--motion-ckpt", type=str, default=None,
                   help="orbax motion checkpoint (random init if "
                        "omitted — smoke use only)")
    p.add_argument("--renderer-ckpt", type=str, default=None)
    p.add_argument("--motion-config", type=str, default=None)
    p.add_argument("--renderer-config", type=str, default=None)
    p.add_argument("--rate", type=int, default=4,
                   help="upsampling factor (power of two)")
    p.add_argument("--keyframes", type=int, default=8,
                   help="keyframes per served clip (output length is "
                        "(K-1)*rate+1)")
    p.add_argument("--clips", type=int, default=1,
                   help="clips per batch in the frozen program; export "
                        "one artifact per planner program size")
    p.add_argument("--platform", type=str, default="tpu",
                   help="comma-separated export targets (tpu, cpu); "
                        "the first one picks the data layout (TPU: "
                        "fused Pallas raster + parity fast path)")
    p.add_argument("--src-size", type=int, nargs=2, default=None,
                   metavar=("H", "W"),
                   help="accept keyframes at this on-disk resolution "
                        "(e.g. 512 768, the reference's frame format) "
                        "and resize on device at ingest; default: "
                        "model resolution")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from renderloom.core import checkpoint as ckpt
    from renderloom.core.config import (MotionConfig, RendererConfig,
                                        load_motion_config,
                                        load_renderer_config)
    from renderloom.data.amass import load_or_compute_stats
    from renderloom.eval.export import export_pipeline, save_exported
    from renderloom.eval.pipeline import build_pipeline
    from renderloom.train.gan import create_gan_state
    from renderloom.train.motion import create_motion_state

    platforms = [s.strip() for s in args.platform.split(",") if s.strip()]
    mcfg = load_motion_config(args.motion_config) if args.motion_config \
        else MotionConfig()
    rcfg = load_renderer_config(args.renderer_config) \
        if args.renderer_config else RendererConfig()
    H, W = rcfg.data.model_height, rcfg.data.model_width

    m_params = g_params = g_stats = None
    if args.motion_ckpt:
        _, _, m_state = create_motion_state(
            jax.random.PRNGKey(args.seed), mcfg)
        m_state = ckpt.restore_checkpoint(args.motion_ckpt,
                                          target=m_state)
        m_params = m_state.params
    if args.renderer_ckpt:
        _, _, _, r_state = create_gan_state(
            jax.random.PRNGKey(args.seed), rcfg, height=H, width=W)
        r_state = ckpt.restore_checkpoint(args.renderer_ckpt,
                                          target=r_state)
        g_params, g_stats = r_state.params_g, r_state.stats_g

    try:
        mean, std = load_or_compute_stats(None, mcfg.dataset)
    except FileNotFoundError:
        mean = std = None
        print("WARNING: no motion normalization stats found")

    src_size = tuple(args.src_size) if args.src_size else None
    fn, m_params, folded_g = build_pipeline(
        mcfg, rcfg, args.rate, args.keyframes, m_params=m_params,
        g_params=g_params, g_stats=g_stats, mean=mean, std=std,
        platform=platforms[0], src_size=src_size)
    exported, meta = export_pipeline(
        fn, m_params, folded_g, args.clips, args.keyframes, H, W,
        args.rate, platforms, src_size=src_size)
    meta["seed"] = args.seed
    meta["trained"] = bool(args.motion_ckpt and args.renderer_ckpt)
    n = save_exported(args.out, exported, meta)
    print(f"exported {meta['inputs']} -> {meta['output']} for "
          f"{platforms} ({n / 1e6:.1f} MB) to {args.out}")


if __name__ == "__main__":
    main()
