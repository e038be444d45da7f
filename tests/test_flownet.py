"""Learned flow interpolator: zero-init behavior, training smoke on
synthetic translation, drop-in compatibility with the flow-op interface.
"""

import jax
import jax.numpy as jnp
import numpy as np

from renderloom.core.config import FlowConfig
from renderloom.models.flownet import (FlowUNet, make_learned_interp,
                                       time_warp)
from renderloom.ops.flow import upsample_background
from renderloom.train.flow import create_flow_state, make_flow_train_step

H, W = 32, 48


def small_cfg():
    return FlowConfig(base_filters=8, levels=3, batch_size=4, lr=2e-3)


def test_zero_init_predicts_zero_flow_and_blend():
    cfg = small_cfg()
    model, _, state = create_flow_state(jax.random.PRNGKey(0), cfg, H, W)
    a = jax.random.uniform(jax.random.PRNGKey(1), (1, H, W, 3))
    b = jax.random.uniform(jax.random.PRNGKey(2), (1, H, W, 3))
    f01, f10 = model.apply({"params": state.params}, a, b)
    assert float(jnp.abs(f01).max()) == 0.0
    assert float(jnp.abs(f10).max()) == 0.0
    # zero flow → time_warp at t=0.5 is the photometric-weighted average
    out = time_warp(a[0], b[0], f01[0], f10[0], jnp.asarray(0.5))
    e = jnp.mean(jnp.abs(a[0] - b[0]), axis=-1, keepdims=True)
    w = 0.5 / (1.0 + e)
    expect = (w * a[0] + w * b[0]) / (2 * w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)


def _translating_batch(rng, batch, dx=3.0, dy=0.0):
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    out = np.zeros((batch, 3, H, W, 3), np.float32)
    for b in range(batch):
        phase = rng.uniform(0, 6.28, 3)
        freq = rng.uniform(0.1, 0.3, 3)
        for i, t in enumerate((0.0, 0.5, 1.0)):
            for c in range(3):
                out[b, i, :, :, c] = 0.5 + 0.5 * np.sin(
                    freq[c] * (xx - dx * t) + 0.7 * freq[c]
                    * (yy - dy * t) + phase[c])
    return {"frames": out}


def test_training_smoke_beats_blend_baseline():
    cfg = small_cfg()
    model, tx, state = create_flow_state(jax.random.PRNGKey(0), cfg, H, W)
    step = make_flow_train_step(model, tx, cfg)
    rng = np.random.default_rng(0)
    first = None
    for i in range(30):
        state, metrics = step(state, _translating_batch(rng, 4))
        if first is None:
            first = float(metrics["loss/rec"])
    last = float(metrics["loss/rec"])
    assert np.isfinite(last)
    assert last < first * 0.7, (first, last)
    # after training, mid-frame prediction must beat the zero-flow blend
    test = _translating_batch(np.random.default_rng(1), 1)
    f0 = jnp.asarray(test["frames"][0, 0])
    gt = test["frames"][0, 1]
    f2 = jnp.asarray(test["frames"][0, 2])
    interp = make_learned_interp(model, state.params)
    pred = np.asarray(interp(f0, f2, 0.5))
    blend = np.asarray((f0 + f2) / 2.0)
    assert np.abs(pred - gt).mean() < np.abs(blend - gt).mean()


def test_learned_interp_drops_into_upsample_background():
    cfg = small_cfg()
    model, _, state = create_flow_state(jax.random.PRNGKey(0), cfg, H, W)
    interp = make_learned_interp(model, state.params)
    keys = jax.random.uniform(jax.random.PRNGKey(3), (3, H, W, 3))
    out = upsample_background(keys, rate=2, interp_fn=interp)
    assert out.shape == (5, H, W, 3)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(keys[0]))
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(keys[1]))
