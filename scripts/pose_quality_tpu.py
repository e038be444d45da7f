"""Pose-head quantification (VERDICT r2 weak #5): PCK@0.1 + mean
keypoint error for the in-framework AlphaPose alternative.

Trains PoseNet on the demo HumanSloMo clips (same generator as the
renderer learning demo: textured panning scenes + articulated person),
then evaluates on the held-out test clip: a predicted joint scores a
PCK hit when within 0.1 x max(bbox side) of the ground truth
(the standard PCK-bbox protocol; AlphaPose role per
``HumanSloMo_Dataset/scripts/gen_run_alphapose.py:17-19``).

Run on the TPU host (serialize TPU jobs):
  python scripts/pose_quality_tpu.py [train_epochs]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(train_epochs: int = 30):
    from renderloom.core.cache import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from scripts.flow_quality_tpu import load_clip
    from scripts.train_eval_tpu_demo import build_h5

    h5 = build_h5("/tmp/pose_demo_hsm.h5")
    print("h5 built")

    # ---- train (skipped when a finished checkpoint is cached) -------
    from renderloom.core import checkpoint as ckpt

    out_dir = "/tmp/pose_quality_run"
    H, W = 320, 480
    if ckpt.latest_step(os.path.join(out_dir, "ckpt")) is None:
        from renderloom.cli.train_pose import main as train_pose_main

        train_pose_main(["--h5", h5, "--out-dir", out_dir,
                         "--height", str(H), "--width", str(W),
                         "--epochs", str(train_epochs)])
    from renderloom.core.config import PoseNetConfig
    from renderloom.models.posenet import decode_heatmaps
    from renderloom.train.pose import create_pose_state

    cfg = PoseNetConfig()
    model, _, state = create_pose_state(jax.random.PRNGKey(0), cfg, H, W)
    state = ckpt.restore_checkpoint(os.path.join(out_dir, "ckpt"),
                                    target=state)
    params = jax.device_get(state).params
    print(f"posenet restored at step {int(state.step)}")

    # ---- eval on the held-out clip ----------------------------------
    import h5py

    clip = load_clip(h5)                    # (17, 320, 480, 3) 0..255
    with h5py.File(h5, "r") as f:
        gt = np.asarray(f["test_a"]["gt_poses"], np.float32)  # (17,19,3)

    @jax.jit
    def infer(imgs):
        logits = model.apply({"params": params}, imgs / 255.0)
        return decode_heatmaps(logits)

    kps, _conf = infer(jnp.asarray(clip))
    pr_xy = np.asarray(kps)                       # (17, 19, 2) x, y px

    gt_xy = gt[..., :2]
    err = np.linalg.norm(pr_xy - gt_xy, axis=-1)        # (17, 19) px

    # PCK threshold: 0.1 x max bbox side of the GT skeleton per frame
    bbox = np.maximum(gt_xy.max(1) - gt_xy.min(1), 1.0)  # (17, 2)
    thr = 0.1 * bbox.max(-1, keepdims=True)              # (17, 1)
    pck = float(np.mean(err < thr))
    mean_err = float(err.mean())
    med_err = float(np.median(err))

    print(f"PCK@0.1(bbox): {pck * 100:.1f}%   mean keypoint error "
          f"{mean_err:.2f} px   median {med_err:.2f} px "
          f"(frames={len(clip)}, joints=19, {H}x{W})")
    summary = {"platform": jax.default_backend(),
               "train_epochs": train_epochs,
               "pck_at_0.1": round(pck, 4),
               "mean_px_error": round(mean_err, 2),
               "median_px_error": round(med_err, 2)}
    print(json.dumps(summary))
    with open("/tmp/pose_quality.json", "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30)
