"""Non-finite-gradient guard: a NaN/inf gradient must skip the update
(params unchanged, counter increments) instead of poisoning training —
failure detection the reference lacks (SURVEY.md §5.3)."""

import jax
import jax.numpy as jnp
import numpy as np

from renderloom.core.config import (MotionConfig, MotionDatasetConfig,
                                    PosEncodeConfig, TransformerConfig)
from renderloom.train.motion import create_motion_state, make_optimizer


def small_cfg():
    return MotionConfig(
        transformer=TransformerConfig(hidden_dim=16, nheads=2,
                                      dim_feedforward=32, enc_layers=1,
                                      dec_layers=1, dropout=0.0),
        pos_encode=PosEncodeConfig(hidden_dim=16),
        dataset=MotionDatasetConfig(max_seq_length=17, train_sample_rate=8,
                                    train_sample_size=4, noise_rate=1,
                                    joint_drop_rate=1, flip_rate=1))


def test_nan_grads_skip_update_and_count():
    cfg = small_cfg()
    _, tx, state = create_motion_state(jax.random.PRNGKey(0), cfg)

    nan_grads = jax.tree.map(lambda p: jnp.full_like(p, jnp.nan),
                             state.params)
    updates, opt1 = tx.update(nan_grads, state.opt_state, state.params)
    params1 = jax.tree.map(lambda p, u: p + u, state.params, updates)
    chex_equal = jax.tree.map(np.array_equal, params1, state.params)
    assert all(jax.tree.leaves(chex_equal)), "NaN grads changed params"
    assert int(opt1.notfinite_count) == 1

    # a finite gradient afterwards applies normally and resets the count
    ok_grads = jax.tree.map(lambda p: jnp.ones_like(p) * 1e-3,
                            state.params)
    updates, opt2 = tx.update(ok_grads, opt1, state.params)
    params2 = jax.tree.map(lambda p, u: p + u, state.params, updates)
    changed = jax.tree.leaves(jax.tree.map(
        lambda a, b: not np.array_equal(a, b), params2, state.params))
    assert any(changed), "finite grads did not update params"
    assert int(opt2.notfinite_count) == 0
