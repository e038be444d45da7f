"""Train the learned flow interpolator (the trainable DAIN replacement).

The reference uses the external pretrained CUDA DAIN repo for background
interpolation; renderloom's LK backend needs no training, and this CLI
trains the optional learned backend on HumanSloMo triplets (consecutive
train_images windows of 3) with middle-frame supervision.

  python -m renderloom.cli.train_flow --h5 HumanSlomo.h5 \
      --out-dir runs/flow --height 256 --width 384

``--synthetic`` trains on procedurally translated patterns (smoke/CI).
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from renderloom.core import checkpoint as ckpt
from renderloom.core.config import FlowConfig, load_flow_config
from renderloom.core.logging import MetricLogger, snapshot_source
from renderloom.data.hsm import HsmReader
from renderloom.parallel import make_mesh, replicate, shard_batch
from renderloom.train.flow import create_flow_state, make_flow_train_step


def synthetic_triplets(rng: np.random.Generator, n: int, batch: int,
                       h: int, w: int):
    """Smoothly translating random patterns: frame1 is the exact
    midpoint of the motion, so flow is learnable and supervision is
    clean."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for _ in range(n):
        out = np.zeros((batch, 3, h, w, 3), np.float32)
        for b in range(batch):
            phase = rng.uniform(0, 6.28, (3,))
            freq = rng.uniform(0.05, 0.2, (3,))
            dx, dy = rng.uniform(-4, 4, 2)
            for i, t in enumerate((0.0, 0.5, 1.0)):
                for c in range(3):
                    out[b, i, :, :, c] = 0.5 + 0.5 * np.sin(
                        freq[c] * (xx - dx * t)
                        + freq[c] * 0.7 * (yy - dy * t) + phase[c])
        yield {"frames": out}


def main(argv=None):
    p = argparse.ArgumentParser(description="renderloom flow training")
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
    args = p.parse_args(argv)

    from renderloom.core.cache import enable_compile_cache
    enable_compile_cache()

    cfg = load_flow_config(args.config) if args.config else FlowConfig()
    epochs = args.epochs or cfg.nr_epochs
    os.makedirs(args.out_dir, exist_ok=True)
    logger = MetricLogger(args.out_dir)
    snapshot_source(args.out_dir,
                    os.path.dirname(os.path.dirname(__file__)))

    mesh = make_mesh()
    H, W = args.height, args.width
    assert H % (2 ** cfg.levels) == 0 and W % (2 ** cfg.levels) == 0, \
        f"height/width must be divisible by {2 ** cfg.levels}"

    reader = None
    if not args.synthetic:
        if not args.h5:
            p.error("--h5 required without --synthetic")
        # every sliding window of 3 consecutive frames is a triplet
        reader = HsmReader(args.h5, video_list=_video_list(args.h5),
                           phase="train", max_frames=3)
        steps_per_epoch = max(len(reader) // cfg.batch_size, 1)
    else:
        steps_per_epoch = args.steps_per_epoch

    model, tx, state = create_flow_state(jax.random.PRNGKey(args.seed),
                                         cfg, H, W)
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"flow UNet parameters: {n_params:,}")

    ckpt_dir = os.path.join(args.out_dir, "ckpt")
    if args.resume and ckpt.latest_step(ckpt_dir) is not None:
        state = ckpt.restore_checkpoint(ckpt_dir, target=state)
        print(f"resumed at step {int(state.step)}")
    state = replicate(mesh, state)
    step_fn = make_flow_train_step(model, tx, cfg)

    @jax.jit
    def resize_batch(frames):
        B, T = frames.shape[:2]
        x = frames.astype(jnp.float32) / 255.0 \
            if frames.dtype == jnp.uint8 else frames.astype(jnp.float32)
        return jax.image.resize(x, (B, T, H, W, 3), method="bilinear")

    rng = np.random.default_rng(args.seed)
    start_epoch = int(state.step) // steps_per_epoch
    for epoch in range(start_epoch, epochs):
        tic = time.time()
        if reader:
            from renderloom.data.prefetch import prefetch
            batches = prefetch(
                (_to_triplet(b) for b in
                 reader.batches(rng, cfg.batch_size)), depth=2)
        else:
            batches = synthetic_triplets(rng, steps_per_epoch,
                                         cfg.batch_size, H, W)
        metrics = {}
        n_steps = 0
        for raw in batches:
            batch = {"frames": resize_batch(jnp.asarray(raw["frames"]))}
            state, metrics = step_fn(state, shard_batch(mesh, batch))
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


def _video_list(h5_path: str):
    import h5py
    with h5py.File(h5_path, "r") as f:
        return [k for k in f.keys() if "train_images" in f[k]]


def _to_triplet(window_batch):
    return {"frames": window_batch["images"]}


if __name__ == "__main__":
    main()
