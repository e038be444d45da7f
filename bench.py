"""Benchmark harness — prints ONE JSON line for the driver.

Primary metric (this round): motion-transformer training throughput in
pose-sequences/sec on one chip at the reference workload (batch 16,
321-frame clips, d_model 128, 6+6 layers, full on-device AMASS synthesis
in the step).  The reference publishes no numbers (BASELINE.md).
``vs_baseline`` is measured against
``BASELINE.json``'s ``published`` table when it has an entry, else 1.0.
The reference's training loop is a PyTorch single-GPU step whose
per-iteration wall time is the only observable.

Run: python bench.py  (uses whatever backend is live; axon TPU on the
driver host, CPU under JAX_PLATFORMS=cpu).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def bench_motion_train(steps: int = 20, warmup: int = 3) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from renderloom.core.config import MotionConfig
    from renderloom.parallel import make_mesh, replicate, shard_batch
    from renderloom.train.motion import create_motion_state, make_train_step

    cfg = MotionConfig()                       # reference hyperparameters
    mesh = make_mesh()
    model, tx, state = create_motion_state(jax.random.PRNGKey(0), cfg)
    state = replicate(mesh, state)
    mean = jnp.zeros((19, 2))
    std = jnp.ones((19, 2))
    step = make_train_step(model, tx, cfg, mean, std)

    L = cfg.dataset.max_seq_length
    B = cfg.batch_size
    rng = np.random.default_rng(0)
    batch = shard_batch(mesh, {
        "motion3d": rng.normal(0, 0.3, (B, 52, 3, L)).astype(np.float32),
        "pad_mask": np.zeros((B, L), dtype=bool),
    })

    for _ in range(warmup):
        state, metrics = step(state, batch)
    jax.block_until_ready(metrics)

    tic = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, batch)
    jax.block_until_ready(metrics)
    wall = time.perf_counter() - tic

    seqs_per_sec = steps * B / wall
    return {
        "metric": "motion_train_seqs_per_sec",
        "value": round(seqs_per_sec, 2),
        "unit": "seq/s",
        "vs_baseline": 1.0,
    }


def main():
    result = bench_motion_train()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
