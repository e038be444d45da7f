"""Reproducibility: identical state + batch → bit-identical updates
(PRNG is explicit state, no hidden host randomness)."""

import jax
import numpy as np

from renderloom.core.config import (MotionConfig, MotionDatasetConfig,
                                    PosEncodeConfig, TransformerConfig)
from renderloom.train.motion import create_motion_state, make_train_step


def cfg():
    return MotionConfig(
        transformer=TransformerConfig(hidden_dim=16, nheads=2,
                                      dim_feedforward=32, enc_layers=1,
                                      dec_layers=1, dropout=0.1),
        pos_encode=PosEncodeConfig(hidden_dim=16),
        dataset=MotionDatasetConfig(max_seq_length=17, train_sample_rate=8,
                                    train_sample_size=4, noise_rate=1,
                                    joint_drop_rate=1, flip_rate=1),
        batch_size=2)


def test_motion_step_deterministic():
    c = cfg()
    model, tx, state0 = create_motion_state(jax.random.PRNGKey(0), c)
    step = make_train_step(model, tx, c,
                           np.zeros((19, 2), np.float32),
                           np.ones((19, 2), np.float32))
    rng = np.random.default_rng(0)
    batch = {"motion3d": rng.normal(0, 0.3, (2, 52, 3, 17)
                                    ).astype(np.float32),
             "pad_mask": np.zeros((2, 17), dtype=bool)}
    host0 = jax.device_get(state0)

    results = []
    for _ in range(2):
        st = jax.tree.map(lambda x: jax.device_put(np.copy(x)), host0)
        st, metrics = step(st, dict(batch))
        st, metrics = step(st, dict(batch))
        results.append((jax.device_get(st).params,
                        {k: float(v) for k, v in metrics.items()}))

    p1, m1 = results[0]
    p2, m2 = results[1]
    assert m1 == m2
    same = jax.tree.map(np.array_equal, p1, p2)
    assert all(jax.tree.leaves(same))
