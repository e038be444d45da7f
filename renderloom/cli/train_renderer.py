"""Train the pose-guided neural renderer on HumanSloMo.

Counterpart of ``Pose_Guided_Neural_Rendering/train.py`` (loop
``:72-110``): per-iteration GAN step, periodic console/jsonl metrics,
periodic PSNR/SSIM eval against the warped-background baseline, per-epoch
LR policy, checkpoints, and the frame-count curriculum (every
``update_frame_step`` epochs the training window grows by one frame,
train.py:109-110 — implemented without the reference's ``videl_list``
crash bug).  Adds a ``--synthetic`` mode (random windows) so the whole
path runs without the 3.2 GB HumanSlomo.h5.

Usage:
  python -m renderloom.cli.train_renderer --config configs/hsm.yaml \
      --h5 HumanSlomo.h5 --out-dir runs/renderer
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time

import jax
import numpy as np

from renderloom.core import checkpoint as ckpt
from renderloom.core.config import RendererConfig, load_renderer_config
from renderloom.core.logging import MetricLogger, snapshot_source
from renderloom.data.hsm import HsmReader
from renderloom.eval.render_eval import evaluate_h5
from renderloom.models.perceptual import PerceptualLoss
from renderloom.parallel import make_mesh, replicate, shard_batch
from renderloom.train.gan import create_gan_state, make_gan_train_step


def synthetic_batches(rng: np.random.Generator, n: int, batch: int,
                      frames: int, h0: int, w0: int):
    for _ in range(n):
        poses = np.zeros((batch, frames, 19, 3), np.float32)
        poses[..., 0] = rng.uniform(10, w0 - 10, (batch, frames, 19))
        poses[..., 1] = rng.uniform(10, h0 - 10, (batch, frames, 19))
        poses[..., 2] = 0.9
        yield {
            "images": rng.integers(0, 255, (batch, frames, h0, w0, 3),
                                   dtype=np.uint8),
            "dain": rng.integers(0, 255, (batch, frames, h0, w0, 3),
                                 dtype=np.uint8),
            "poses": poses,
        }


def main(argv=None):
    p = argparse.ArgumentParser(description="renderloom renderer training")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--out-dir", type=str, default="runs/renderer")
    p.add_argument("--h5", type=str, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--allow-random-vgg", action="store_true",
                   help="proceed without pretrained VGG19 weights (the "
                        "perceptual loss then uses random features — NOT "
                        "the reference objective)")
    p.add_argument("--steps-per-epoch", type=int, default=20,
                   help="synthetic mode only")
    p.add_argument("--height", type=int, default=None,
                   help="override model height (synthetic smoke)")
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--eval-keyframes", type=int, default=None)
    p.add_argument("--eval-video-dir", type=str, default=None,
                   help="write per-clip grid videos during eval "
                        "(the reference's gen_videos)")
    p.add_argument("--profile-dir", type=str, default=None,
                   help="capture an XLA profiler trace of steps 3-8")
    args = p.parse_args(argv)

    from renderloom.core.cache import enable_compile_cache
    enable_compile_cache()

    cfg = load_renderer_config(args.config) if args.config \
        else RendererConfig()
    if args.batch_size:
        cfg = dataclasses.replace(cfg, batch_size=args.batch_size)
    if args.height or args.width:
        cfg = dataclasses.replace(cfg, data=dataclasses.replace(
            cfg.data,
            model_height=args.height or cfg.data.model_height,
            load_height=args.height or cfg.data.load_height,
            model_width=args.width or cfg.data.model_width,
            load_width=args.width or cfg.data.load_width))
    seed = args.seed if args.seed is not None else cfg.seed
    epochs = args.epochs or cfg.optim.nr_epochs
    d = cfg.data

    os.makedirs(args.out_dir, exist_ok=True)
    logger = MetricLogger(args.out_dir)
    snapshot_source(args.out_dir,
                    os.path.dirname(os.path.dirname(__file__)))

    mesh = make_mesh()
    print(f"devices: {jax.device_count()} mesh: {mesh.shape}")

    reader = test_reader = None
    if not args.synthetic:
        h5_path = args.h5 or d.h5_file
        reader = HsmReader(h5_path, d.train_video_list or [], "train",
                           d.max_frames)
        test_reader = HsmReader(h5_path, d.test_video_list, "test",
                                d.max_frames)
        steps_per_epoch = max(len(reader) // cfg.batch_size, 1)
    else:
        steps_per_epoch = args.steps_per_epoch

    gen, dis, txs, state = create_gan_state(
        jax.random.PRNGKey(seed), cfg, steps_per_epoch)
    n_g = sum(x.size for x in jax.tree.leaves(state.params_g))
    n_d = sum(x.size for x in jax.tree.leaves(state.params_d))
    print(f"generator params: {n_g:,}  discriminator params: {n_d:,}")

    ckpt_dir = os.path.join(args.out_dir, "ckpt")
    if args.resume and ckpt.latest_step(ckpt_dir) is not None:
        state = ckpt.restore_checkpoint(ckpt_dir, target=state)
        print(f"resumed at step {int(state.step)}")

    state = replicate(mesh, state)
    # hard-fail on the silent random-feature fallback: synthetic smoke
    # runs are exempt (they never claim reference parity)
    perceptual = PerceptualLoss(
        require_pretrained=not (args.allow_random_vgg or args.synthetic),
        compute_dtype=cfg.compute_dtype)
    # fused Pallas rasterization on TPU; vmapped jnp path elsewhere.
    # prep runs INSIDE the jitted step: raw uint8 windows ship to device
    # (~30x less transfer than prepared labels), augmentation +
    # rasterization are data-parallel over the mesh
    fused = jax.default_backend() == "tpu"
    step_fn = make_gan_train_step(gen, dis, txs, cfg, perceptual,
                                  data_cfg=d, fused_raster=fused)

    rng = np.random.default_rng(seed)
    start_epoch = int(state.step) // steps_per_epoch
    max_frames = d.max_frames

    for epoch in range(start_epoch, epochs):
        # curriculum (train.py:109-110)
        want_frames = d.max_frames + epoch // d.update_frame_step
        if reader and want_frames != max_frames:
            max_frames = want_frames
            reader.set_max_frames(max_frames)
            steps_per_epoch = max(len(reader) // cfg.batch_size, 1)
            print(f"curriculum: window -> {max_frames} frames")

        tic = time.time()
        if reader:
            from renderloom.data.prefetch import prefetch
            batches = prefetch(reader.batches(rng, cfg.batch_size),
                               depth=2)
        else:
            batches = synthetic_batches(rng, steps_per_epoch,
                                        cfg.batch_size, max_frames,
                                        d.load_height, d.load_width)
        metrics = {}
        n_steps = 0
        tracing = False
        for raw in batches:
            if args.profile_dir and epoch == start_epoch:
                if n_steps == 2:        # past compilation
                    jax.profiler.start_trace(args.profile_dir)
                    tracing = True
                elif n_steps == 8 and tracing:
                    jax.block_until_ready(metrics)
                    jax.profiler.stop_trace()
                    tracing = False
            batch = shard_batch(mesh, {
                "images": raw["images"],
                "dain": raw["dain"],
                "poses": raw["poses"].astype(np.float32),
            })
            state, metrics = step_fn(state, batch)
            n_steps += 1
            if n_steps % 10 == 0:
                logger.log(int(state.step),
                           {k_: float(v) for k_, v in metrics.items()},
                           prefix="train/")
        if tracing:
            jax.block_until_ready(metrics)
            jax.profiler.stop_trace()
        wall = time.time() - tic
        if metrics:
            scalars = {k_: float(v) for k_, v in metrics.items()}
            scalars["steps_per_sec"] = n_steps / wall
            logger.console(int(state.step), scalars,
                           header=f"epoch {epoch} ")

        if test_reader and (epoch + 1) % 4 == 0:
            host_state = jax.device_get(state)
            results = evaluate_h5(gen, host_state, cfg, test_reader,
                                  max_keyframes=args.eval_keyframes,
                                  perceptual=perceptual,
                                  video_dir=args.eval_video_dir)
            logger.log(int(state.step), results, prefix="eval/")
            logger.console(int(state.step), results, header="eval ")

        if (epoch + 1) % 4 == 0 or epoch == epochs - 1:
            path = ckpt.save_checkpoint(ckpt_dir, int(state.step),
                                        jax.device_get(state))
            print(f"checkpoint: {path}")


if __name__ == "__main__":
    main()
