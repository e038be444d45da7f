"""Train the in-framework 2D pose head on HumanSloMo (image, pose) pairs.

The external-AlphaPose alternative (SURVEY.md §2.4): after training,
``python -m renderloom.cli.extract_pose`` converts frame folders to
openpose JSONs with zero external model dependencies.

  python -m renderloom.cli.train_pose --h5 HumanSlomo.h5 \
      --out-dir runs/pose --height 256 --width 384

``--synthetic`` trains on procedural blob images (smoke/CI).
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from renderloom.core import checkpoint as ckpt
from renderloom.core.config import PoseNetConfig, load_pose_config
from renderloom.core.logging import MetricLogger, snapshot_source
from renderloom.data.hsm import HsmReader
from renderloom.models.posenet import N_JOINTS
from renderloom.parallel import make_mesh, replicate, shard_batch
from renderloom.train.pose import create_pose_state, make_pose_train_step


def synthetic_batches(rng: np.random.Generator, n: int, batch: int,
                      h: int, w: int):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for _ in range(n):
        imgs = np.zeros((batch, h, w, 3), np.float32)
        poses = np.zeros((batch, N_JOINTS, 3), np.float32)
        for b in range(batch):
            base = rng.uniform((w * .25, h * .25), (w * .75, h * .75))
            for j in range(N_JOINTS):
                cx = np.clip(base[0] + w * .15
                             * np.cos(2 * np.pi * j / N_JOINTS), 4, w - 4)
                cy = np.clip(base[1] + h * .15
                             * np.sin(2 * np.pi * j / N_JOINTS), 4, h - 4)
                imgs[b, :, :, j % 3] += np.exp(
                    -((xx - cx) ** 2 + (yy - cy) ** 2) / 30.0)
                poses[b, j] = (cx, cy, 0.9)
        yield {"images": np.clip(imgs, 0, 1), "poses": poses}


def hsm_frame_batches(reader: HsmReader, rng: np.random.Generator,
                      batch: int, h: int, w: int):
    """Single frames + scaled poses from max_frames=1 windows."""
    for win in reader.batches(rng, batch):
        imgs = win["images"][:, 0]              # (B, H0, W0, 3) uint8
        poses = win["poses"][:, 0].astype(np.float32)
        sy = h / imgs.shape[1]
        sx = w / imgs.shape[2]
        poses[..., 0] *= sx
        poses[..., 1] *= sy
        yield {"images": imgs, "poses": poses}


def main(argv=None):
    p = argparse.ArgumentParser(description="renderloom pose training")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--h5", type=str, default=None)
    p.add_argument("--out-dir", type=str, required=True)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=384)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--steps-per-epoch", type=int, default=50,
                   help="synthetic mode only")
    p.add_argument("--occlude-rate", type=float, default=None,
                   help="random-erase occlusion augmentation "
                        "probability (see PoseNetConfig.occlude_rate)")
    args = p.parse_args(argv)

    from renderloom.core.cache import enable_compile_cache
    enable_compile_cache()

    cfg = load_pose_config(args.config) if args.config else PoseNetConfig()
    if args.occlude_rate is not None:
        import dataclasses
        cfg = dataclasses.replace(cfg, occlude_rate=args.occlude_rate)
    epochs = args.epochs or cfg.nr_epochs
    os.makedirs(args.out_dir, exist_ok=True)
    logger = MetricLogger(args.out_dir)
    snapshot_source(args.out_dir,
                    os.path.dirname(os.path.dirname(__file__)))

    mesh = make_mesh()
    H, W = args.height, args.width

    reader = None
    if not args.synthetic:
        if not args.h5:
            p.error("--h5 required without --synthetic")
        import h5py
        with h5py.File(args.h5, "r") as f:
            vids = [k for k in f.keys() if "train_images" in f[k]]
        reader = HsmReader(args.h5, vids, phase="train", max_frames=1)
        steps_per_epoch = max(len(reader) // cfg.batch_size, 1)
    else:
        steps_per_epoch = args.steps_per_epoch

    model, tx, state = create_pose_state(jax.random.PRNGKey(args.seed),
                                         cfg, H, W)
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"PoseNet parameters: {n_params:,}")

    ckpt_dir = os.path.join(args.out_dir, "ckpt")
    if args.resume and ckpt.latest_step(ckpt_dir) is not None:
        state = ckpt.restore_checkpoint(ckpt_dir, target=state)
        print(f"resumed at step {int(state.step)}")
    state = replicate(mesh, state)
    step_fn = make_pose_train_step(model, tx, cfg)

    @jax.jit
    def resize_images(imgs):
        x = imgs.astype(jnp.float32) / 255.0 \
            if imgs.dtype == jnp.uint8 else imgs.astype(jnp.float32)
        B = x.shape[0]
        return jax.image.resize(x, (B, H, W, 3), method="bilinear")

    rng = np.random.default_rng(args.seed)
    start_epoch = int(state.step) // steps_per_epoch
    for epoch in range(start_epoch, epochs):
        tic = time.time()
        if reader:
            from renderloom.data.prefetch import prefetch
            batches = prefetch(hsm_frame_batches(reader, rng,
                                                 cfg.batch_size, H, W),
                               depth=2)
        else:
            batches = synthetic_batches(rng, steps_per_epoch,
                                        cfg.batch_size, H, W)
        metrics = {}
        n_steps = 0
        for raw in batches:
            batch = shard_batch(mesh, {
                "images": np.asarray(resize_images(
                    jnp.asarray(raw["images"]))),
                "poses": raw["poses"],
            })
            state, metrics = step_fn(state, batch)
            n_steps += 1
            if n_steps % 20 == 0:
                logger.log(int(state.step),
                           {k: float(v) for k, v in metrics.items()},
                           prefix="train/")
        wall = time.time() - tic
        if metrics:
            scalars = {k: float(v) for k, v in metrics.items()}
            scalars["steps_per_sec"] = n_steps / wall
            logger.console(int(state.step), scalars,
                           header=f"epoch {epoch} ")
        if (epoch + 1) % 5 == 0 or epoch == epochs - 1:
            path = ckpt.save_checkpoint(ckpt_dir, int(state.step),
                                        jax.device_get(state))
            print(f"checkpoint: {path}")


if __name__ == "__main__":
    main()
