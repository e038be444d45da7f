"""Train the motion transformer on AMASS.

Counterpart of ``Human_Motion_Modelling/train.py`` (epoch loop
``:103-130``): per-epoch batching, periodic eval (MSE/MAE/MAX vs linear
baseline), periodic checkpointing, per-epoch LR policy, source snapshot.
Differences: data-parallel over a ``jax.sharding.Mesh`` (batch sharded,
params replicated), all sample synthesis on device inside the jitted
step, orbax checkpoints holding params+opt+step+key, and a
``--synthetic`` mode that trains on procedurally generated motion so the
full path is runnable without the 17 GB AMASS h5.

Usage:
  python -m renderloom.cli.train_motion --config configs/motion.yaml \
      --out-dir runs/motion --h5 AMASS_3D_joints.h5
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from renderloom.core import checkpoint as ckpt
from renderloom.core.config import MotionConfig, load_motion_config
from renderloom.core.logging import MetricLogger, snapshot_source
from renderloom.data.amass import AmassReader, load_or_compute_stats
from renderloom.eval.motion_eval import MotionEvaluator
from renderloom.parallel import make_mesh, replicate, shard_batch
from renderloom.train.motion import create_motion_state, make_train_step


def synthetic_batches(rng: np.random.Generator, n_batches: int,
                      batch_size: int, seq_len: int):
    """Procedural stand-in for AMASS: smooth random sinusoid joint paths."""
    for _ in range(n_batches):
        t = np.linspace(0, 4 * np.pi, seq_len, dtype=np.float32)
        freq = rng.uniform(0.5, 2.0, (batch_size, 52, 3, 1))
        phase = rng.uniform(0, 2 * np.pi, (batch_size, 52, 3, 1))
        amp = rng.uniform(0.1, 0.6, (batch_size, 52, 3, 1))
        motion = amp * np.sin(freq * t[None, None, None, :] + phase)
        yield {"motion3d": motion.astype(np.float32),
               "pad_mask": np.zeros((batch_size, seq_len), dtype=bool)}


def main(argv=None):
    p = argparse.ArgumentParser(description="renderloom motion training")
    p.add_argument("--config", type=str, default=None,
                   help="yaml config (reference layout accepted)")
    p.add_argument("--out-dir", type=str, default="runs/motion")
    p.add_argument("--h5", type=str, default=None,
                   help="AMASS_3D_joints.h5 path (overrides config)")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--synthetic", action="store_true",
                   help="train on procedural motion (no h5 needed)")
    p.add_argument("--steps-per-epoch", type=int, default=50,
                   help="synthetic mode only")
    p.add_argument("--profile-dir", type=str, default=None,
                   help="capture an XLA profiler trace of steps 3-8")
    p.add_argument("--eval-limit", type=int, default=None,
                   help="cap eval samples for quick runs")
    args = p.parse_args(argv)

    from renderloom.core.cache import enable_compile_cache
    enable_compile_cache()

    import dataclasses

    cfg = load_motion_config(args.config) if args.config else MotionConfig()
    if args.batch_size:
        cfg = dataclasses.replace(cfg, batch_size=args.batch_size)
    seed = args.seed if args.seed is not None else cfg.seed
    epochs = args.epochs or cfg.optim.nr_epochs

    os.makedirs(args.out_dir, exist_ok=True)
    logger = MetricLogger(args.out_dir)
    snapshot_source(args.out_dir,
                    os.path.dirname(os.path.dirname(__file__)))

    mesh = make_mesh()
    print(f"devices: {jax.device_count()} mesh: {mesh.shape}")

    d = cfg.dataset
    reader = None
    evaluator = None
    if not args.synthetic:
        h5_path = args.h5 or d.h5_file
        reader = AmassReader(h5_path, d.train_split)
        test_reader = AmassReader(h5_path, d.test_split)
        mean, std = load_or_compute_stats(reader, d)
        evaluator = MotionEvaluator(
            cfg, test_reader, mean, std,
            os.path.join(d.data_root, "evaluation_view.npy"))
    else:
        mean = np.zeros((19, 2), np.float32)
        std = np.ones((19, 2), np.float32)

    steps_per_epoch = (max(len(reader) // cfg.batch_size, 1)
                       if reader else args.steps_per_epoch)
    model, tx, state = create_motion_state(
        jax.random.PRNGKey(seed), cfg, steps_per_epoch)
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"motion transformer parameters: {n_params:,}")

    ckpt_dir = os.path.join(args.out_dir, "ckpt")
    if args.resume and ckpt.latest_step(ckpt_dir) is not None:
        state = ckpt.restore_checkpoint(ckpt_dir, target=state)
        print(f"resumed at step {int(state.step)}")

    state = replicate(mesh, state)
    step_fn = make_train_step(model, tx, cfg,
                              jnp.asarray(mean), jnp.asarray(std))

    rng = np.random.default_rng(seed)
    start_epoch = int(state.step) // steps_per_epoch
    for epoch in range(start_epoch, epochs):
        tic = time.time()
        if reader:
            from renderloom.data.prefetch import prefetch
            batches = prefetch(
                reader.batches(rng, cfg.batch_size, d.max_seq_length,
                               d.train_sample_rate), depth=2)
        else:
            batches = synthetic_batches(rng, steps_per_epoch,
                                        cfg.batch_size, d.max_seq_length)
        metrics = {}
        n_steps = 0
        tracing = False
        for batch in batches:
            if args.profile_dir and epoch == start_epoch:
                if n_steps == 2:        # past compilation
                    jax.profiler.start_trace(args.profile_dir)
                    tracing = True
                elif n_steps == 8 and tracing:
                    jax.block_until_ready(metrics)
                    jax.profiler.stop_trace()
                    tracing = False
            state, metrics = step_fn(state, shard_batch(mesh, batch))
            n_steps += 1
            if n_steps % 20 == 0:
                logger.log(int(state.step),
                           {k: float(v) for k, v in metrics.items()},
                           prefix="train/")
        if tracing:
            jax.block_until_ready(metrics)
            jax.profiler.stop_trace()
        wall = time.time() - tic
        if metrics:
            scalars = {k: float(v) for k, v in metrics.items()}
            scalars["steps_per_sec"] = n_steps / wall
            logger.console(int(state.step), scalars,
                           header=f"epoch {epoch} ")

        if evaluator and (epoch + 1) % cfg.eval_step == 0:
            results = evaluator.evaluate(model, jax.device_get(state).params,
                                         limit=args.eval_limit)
            logger.log(int(state.step), results, prefix="eval/")
            logger.console(int(state.step), results, header="eval ")

        if (epoch + 1) % cfg.save_step == 0 or epoch == epochs - 1:
            path = ckpt.save_checkpoint(ckpt_dir, int(state.step),
                                        jax.device_get(state))
            print(f"checkpoint: {path}")


if __name__ == "__main__":
    main()
