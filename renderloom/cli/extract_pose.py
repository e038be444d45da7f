"""Extract openpose-format JSONs from frame folders with the trained
in-framework pose head — the zero-dependency alternative to the external
AlphaPose stage (``build_dataset alphapose`` emits the external driver;
this command needs no external repo).

  python -m renderloom.cli.extract_pose --ckpt runs/pose/ckpt \
      --frames clips/ --poses poses_out/
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from renderloom.core import checkpoint as ckpt
from renderloom.core.config import PoseNetConfig, load_pose_config
from renderloom.models.posenet import decode_heatmaps
from renderloom.train.pose import create_pose_state


def _openpose_json(kps: np.ndarray, conf: np.ndarray) -> dict:
    """19-joint (x, y) + conf → openpose BODY25-style person dict
    (inverse of the reader contract in ``renderloom.data.openpose``:
    joints 0-14 + 19 + 22 map from our layout; hands are averaged
    points, written as single-entry hand lists)."""
    body = np.zeros((25, 3), np.float32)
    # our layout 0..14 = BODY25 0..14; 15 = left toe (19), 16 = right
    # toe (22); 17/18 = hand means
    body[:15, :2] = kps[:15]
    body[:15, 2] = conf[:15]
    body[19, :2] = kps[15]
    body[19, 2] = conf[15]
    body[22, :2] = kps[16]
    body[22, 2] = conf[16]
    left = [float(kps[17, 0]), float(kps[17, 1]), float(conf[17])]
    right = [float(kps[18, 0]), float(kps[18, 1]), float(conf[18])]
    return {
        "pose_keypoints_2d": [float(v) for v in body.reshape(-1)],
        "hand_left_keypoints_2d": left,
        "hand_right_keypoints_2d": right,
    }


def extract_folder(model, params, frames_dir: str, out_dir: str,
                   height: int, width: int, batch: int = 8) -> int:
    from PIL import Image

    names = sorted(f for f in os.listdir(frames_dir)
                   if f.lower().endswith((".png", ".jpg", ".jpeg")))
    os.makedirs(out_dir, exist_ok=True)

    @jax.jit
    def infer(params, imgs):
        logits = model.apply({"params": params}, imgs)
        return decode_heatmaps(logits)

    n = 0
    for i in range(0, len(names), batch):
        chunk = names[i:i + batch]
        imgs, scales = [], []
        for f in chunk:
            im = Image.open(os.path.join(frames_dir, f)).convert("RGB")
            scales.append((im.width / width, im.height / height))
            imgs.append(np.asarray(im.resize((width, height)),
                                   np.float32) / 255.0)
        arr = np.stack(imgs)
        if len(chunk) < batch:     # static shapes: pad the tail batch
            arr = np.concatenate(
                [arr, np.zeros((batch - len(chunk),) + arr.shape[1:],
                               np.float32)])
        kps, conf = infer(params, jnp.asarray(arr))
        kps, conf = np.asarray(kps), np.asarray(conf)
        for j, f in enumerate(chunk):
            sx, sy = scales[j]
            pts = kps[j] * np.asarray([[sx, sy]], np.float32)
            person = _openpose_json(pts, conf[j])
            stem = os.path.splitext(f)[0]
            with open(os.path.join(out_dir, f"{stem}_keypoints.json"),
                      "w") as fh:
                json.dump({"version": 1.3, "people": [person]}, fh)
            n += 1
    return n


def main(argv=None):
    p = argparse.ArgumentParser(
        description="renderloom pose extraction (openpose JSONs)")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--frames", type=str, required=True,
                   help="folder of frames, or folder of clip subfolders")
    p.add_argument("--poses", type=str, required=True)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=384)
    args = p.parse_args(argv)

    from renderloom.core.cache import enable_compile_cache
    enable_compile_cache()

    cfg = load_pose_config(args.config) if args.config else PoseNetConfig()
    model, _, state = create_pose_state(jax.random.PRNGKey(0), cfg,
                                        args.height, args.width)
    state = ckpt.restore_checkpoint(args.ckpt, target=state)
    print(f"loaded pose checkpoint at step {int(state.step)}")

    subdirs = sorted(
        d for d in os.listdir(args.frames)
        if os.path.isdir(os.path.join(args.frames, d)))
    clips = subdirs or [""]
    total = 0
    for clip in clips:
        n = extract_folder(model, state.params,
                           os.path.join(args.frames, clip),
                           os.path.join(args.poses, clip),
                           args.height, args.width)
        print(f"clip {clip or '.'}: {n} pose JSONs")
        total += n
    print(f"wrote {total} JSONs to {args.poses}")


if __name__ == "__main__":
    main()
