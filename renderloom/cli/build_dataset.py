"""Dataset production CLI.

One entry point for the ``HumanSloMo_Dataset`` shell-script stage
(``download.sh``/``gen_dataset.sh``/``gen_h5.sh``, SURVEY.md §2.3) plus
the in-framework background-warping stage that replaces the external
DAIN scripts (``scripts/DAIN_{train,test}.py``).

Subcommands:
  download   emit a youtube-dl script for missing videos
  extract    pull clip frames out of the mp4s (768×512)
  warp       synthesize DAIN-equivalent backgrounds with the flow
             interpolator (train mode: i→i+2 skip-frame; test mode:
             recursive doubling at --rate)
  pack-hsm   folder tree → HumanSlomo.h5
  pack-amass AMASS npz archives → AMASS_3D_joints.h5 (needs the
             external human_body_prior package)
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def cmd_download(args):
    from renderloom.data.builders import emit_download_script
    n = emit_download_script(args.csv, args.videos, args.out)
    print(f"wrote {n} download commands to {args.out}")


def cmd_extract(args):
    from renderloom.data.builders import extract_clips
    n = extract_clips(args.videos, args.clips, args.out)
    print(f"extracted {n} frames to {args.out}")


def cmd_warp(args):
    import jax.numpy as jnp
    from PIL import Image

    from renderloom.ops.flow import train_background, upsample_background

    for clip in sorted(os.listdir(args.frames)):
        src = os.path.join(args.frames, clip)
        if not os.path.isdir(src):
            continue
        files = sorted(f for f in os.listdir(src)
                       if f.lower().endswith((".png", ".jpg")))
        frames = np.stack([
            np.asarray(Image.open(os.path.join(src, f)).convert("RGB"))
            for f in files]).astype(np.float32) / 255.0
        if args.mode == "train":
            out = train_background(jnp.asarray(frames))
        else:
            out = upsample_background(jnp.asarray(frames), args.rate)
        dst = os.path.join(args.out, clip)
        os.makedirs(dst, exist_ok=True)
        arr = np.asarray(jnp.clip(out, 0, 1) * 255).astype(np.uint8)
        for i in range(arr.shape[0]):
            Image.fromarray(arr[i]).save(
                os.path.join(dst, f"{i:05d}.png"))
        print(f"{clip}: {arr.shape[0]} background frames")


def cmd_alphapose(args):
    """Emit the shell driver for the external AlphaPose detector
    (``HumanSloMo_Dataset/scripts/gen_run_alphapose.py:11-21`` —
    renderloom keeps pose extraction external, SURVEY.md §2.4)."""
    clips = sorted(
        d for d in os.listdir(args.frames)
        if os.path.isdir(os.path.join(args.frames, d)))
    with open(args.out, "w") as f:
        for clip in clips:
            indir = os.path.join(args.frames, clip)
            outdir = os.path.join(args.poses, clip)
            f.write(
                "python3 scripts/demo_inference.py "
                "--cfg configs/halpe_136/resnet/"
                "256x192_res50_lr1e-3_2x-regression.yaml "
                "--checkpoint pretrained_models/halpe136_fast_res50_"
                "256x192.pth "
                f"--indir {indir} --outdir {outdir} "
                "--format open --pose_track\n")
    print(f"wrote {len(clips)} AlphaPose commands to {args.out}")


def cmd_pack_hsm(args):
    from renderloom.data.builders import pack_hsm_h5
    counts = pack_hsm_h5(args.root, args.out)
    print(f"packed {len(counts)} clips "
          f"({sum(counts.values())} frames) into {args.out}")


def cmd_pack_amass(args):
    from renderloom.core.config import MotionDatasetConfig
    from renderloom.data.builders import pack_amass_h5
    cfg = MotionDatasetConfig()
    splits = list(cfg.train_split) + list(cfg.test_split)
    n = pack_amass_h5(args.root, args.out, splits, args.body_model)
    print(f"packed {n} motions into {args.out}")


def main(argv=None):
    p = argparse.ArgumentParser(description="renderloom dataset builder")
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("download")
    d.add_argument("--csv", required=True)
    d.add_argument("--videos", default="videos")
    d.add_argument("--out", default="tmp.sh")
    d.set_defaults(fn=cmd_download)

    e = sub.add_parser("extract")
    e.add_argument("--videos", required=True)
    e.add_argument("--clips", required=True, help="train/test list json")
    e.add_argument("--out", required=True)
    e.set_defaults(fn=cmd_extract)

    w = sub.add_parser("warp")
    w.add_argument("--frames", required=True,
                   help="folder of per-clip frame folders")
    w.add_argument("--out", required=True)
    w.add_argument("--mode", choices=("train", "test"), default="train")
    w.add_argument("--rate", type=int, default=4)
    w.set_defaults(fn=cmd_warp)

    ap = sub.add_parser("alphapose")
    ap.add_argument("--frames", required=True)
    ap.add_argument("--poses", required=True)
    ap.add_argument("--out", default="run_alphapose.sh")
    ap.set_defaults(fn=cmd_alphapose)

    h = sub.add_parser("pack-hsm")
    h.add_argument("--root", required=True)
    h.add_argument("--out", default="HumanSlomo.h5")
    h.set_defaults(fn=cmd_pack_hsm)

    a = sub.add_parser("pack-amass")
    a.add_argument("--root", required=True)
    a.add_argument("--out", default="AMASS_3D_joints.h5")
    a.add_argument("--body-model", default="")
    a.set_defaults(fn=cmd_pack_amass)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
