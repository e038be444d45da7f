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


def build_pose_h5(path: str, n_subjects: int = 12):
    """Pose-specific training set: the GAN demo's 4 fixed subjects are
    too few for held-out-subject generalization (round-4: PCK@0.1
    68.7% held-out vs 88.9% same-subject) — generate ``n_subjects``
    randomized bodies (limb scale, height-in-frame, gait amplitude,
    palette, build) and keep the held-out eval subject ``test_a``
    byte-identical to the GAN demo's (same parameters/seed), so scores
    stay comparable across rounds."""
    import h5py

    from scripts.train_eval_tpu_demo import (N_TEST, N_TRAIN, SUBJECTS,
                                             _draw_person, _png, _pose,
                                             _scene)

    rng = np.random.default_rng(0)
    subjects = {}
    for i in range(n_subjects):
        subjects[f"clip_{i:02d}"] = (
            float(rng.uniform(0.7, 1.35)),     # limb scale
            float(rng.uniform(115.0, 215.0)),  # height in frame
            float(rng.uniform(6.0, 22.0)),     # gait sway
            int(rng.integers(1, 10_000)),      # palette seed
            float(rng.uniform(4.5, 9.5)))      # build (limb radius)
    subjects["test_a"] = SUBJECTS["test_a"]

    with h5py.File(path, "w") as f:
        for vid, params in subjects.items():
            test = vid == "test_a"
            n = N_TEST if test else N_TRAIN
            prefix = "gt" if test else "train"
            scene = _scene(rng if not test else np.random.default_rng(0))
            if test:
                # reproduce build_h5's rng stream position for test_a:
                # its scene is the 5th drawn from seed 0
                r0 = np.random.default_rng(0)
                for _ in range(4):
                    _scene(r0)
                scene = _scene(r0)
            grp = f.create_group(vid)
            dt = h5py.special_dtype(vlen=np.uint8)
            imgs = grp.create_dataset(f"{prefix}_images", (n,), dtype=dt)
            dains = grp.create_dataset(f"{prefix}_dain", (n,), dtype=dt)
            poses = np.zeros((n, 19, 3), np.float64)
            scale, cy0, sway, cseed, limb_r = params
            for i in range(n):
                t = i / (n - 1)
                back = np.roll(scene, int(8 * t), axis=1)
                pose = _pose(t, scale, cy0, sway)
                poses[i] = pose
                imgs[i] = _png(_draw_person(back, pose, cseed, limb_r))
                dains[i] = _png(np.roll(back, 1, axis=1))
            grp.create_dataset(f"{prefix}_poses", data=poses)
    return path


def main(train_epochs: int = 30):
    from renderloom.core.cache import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from scripts.flow_quality_tpu import load_clip

    h5 = build_pose_h5("/tmp/pose_demo_hsm12.h5")
    print("h5 built")

    # ---- train (skipped when a finished checkpoint is cached) -------
    from renderloom.core import checkpoint as ckpt

    out_dir = "/tmp/pose_quality12_run"   # new path: don't resume the
    # 4-subject round-4 checkpoint onto the 12-subject train set
    H, W = 320, 480
    if ckpt.latest_step(os.path.join(out_dir, "ckpt")) is None:
        from renderloom.cli.train_pose import main as train_pose_main

        # occlusion augmentation on (VERDICT r3 #8): the eval clip's
        # subject is held out AND an occluded eval variant is scored
        train_pose_main(["--h5", h5, "--out-dir", out_dir,
                         "--height", str(H), "--width", str(W),
                         "--epochs", str(train_epochs),
                         "--occlude-rate", "0.5"])
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

    def score(frames, tag):
        kps, _conf = infer(jnp.asarray(frames))
        pr_xy = np.asarray(kps)                   # (17, 19, 2) x, y px
        gt_xy = gt[..., :2]
        err = np.linalg.norm(pr_xy - gt_xy, axis=-1)     # (17, 19) px
        # PCK threshold: k x max bbox side of the GT skeleton per frame
        bbox = np.maximum(gt_xy.max(1) - gt_xy.min(1), 1.0)
        side = bbox.max(-1, keepdims=True)               # (17, 1)
        out = {
            f"{tag}pck_at_0.1": round(float(np.mean(err < 0.1 * side)),
                                      4),
            f"{tag}pck_at_0.2": round(float(np.mean(err < 0.2 * side)),
                                      4),
            f"{tag}mean_px_error": round(float(err.mean()), 2),
            f"{tag}median_px_error": round(float(np.median(err)), 2),
        }
        if not tag:          # per-joint breakdown for the clean eval
            out["per_joint_mean_px"] = [round(float(v), 1)
                                        for v in err.mean(0)]
        return out

    summary = {"platform": jax.default_backend(),
               "train_epochs": train_epochs,
               "held_out_subject": True}
    summary.update(score(clip, ""))

    # occluded variant: a flat gray box over a random third of the
    # person bbox per frame — measures the occluded-joint regime the
    # round-3 number was weakest on
    occ = clip.copy()
    rng = np.random.default_rng(3)
    for i in range(len(occ)):
        xy = gt[i, :, :2]
        x0, y0 = xy.min(0)
        x1, y1 = xy.max(0)
        bw, bh = (x1 - x0) * 0.45, (y1 - y0) * 0.45
        cx = rng.uniform(x0, x1)
        cy = rng.uniform(y0, y1)
        xa, xb = int(max(cx - bw / 2, 0)), int(min(cx + bw / 2, W))
        ya, yb = int(max(cy - bh / 2, 0)), int(min(cy + bh / 2, H))
        occ[i, ya:yb, xa:xb] = 128.0
    summary.update(score(occ, "occluded_"))

    print(json.dumps(summary))
    with open("/tmp/pose_quality.json", "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30)
