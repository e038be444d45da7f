"""Flow-interpolator training: middle-frame supervision on triplets.

The reference's background interpolator (external DAIN) was trained
elsewhere; renderloom trains its own drop-in on the HumanSloMo frames it
already has: for a triplet (f0, f1, f2) the UNet predicts bidirectional
flow between f0 and f2, the Super-SloMo time warp synthesizes t=0.5, and
the losses are

* reconstruction: L1(warp(f0,f2,0.5), f1) — the ground-truth middle;
* photometric: L1 of each keyframe warped onto the other (brightness
  constancy for the full flows);
* smoothness: L1 of flow spatial gradients.

Functional state (params+opt+step+PRNG in one pytree), orbax-compatible,
non-finite-gradient guard like the other trainers.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from renderloom.core.config import FlowConfig
from renderloom.models.flownet import FlowUNet, time_warp
from renderloom.ops.flow import backward_warp


class FlowTrainState(struct.PyTreeNode):
    params: dict
    opt_state: optax.OptState
    step: jax.Array
    key: jax.Array


def make_flow_optimizer(cfg: FlowConfig):
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adam(cfg.lr, b1=0.9, b2=0.999),
    )
    return optax.apply_if_finite(tx, max_consecutive_errors=10)


def create_flow_state(key: jax.Array, cfg: FlowConfig,
                      height: int = 64, width: int = 64
                      ) -> Tuple[FlowUNet, optax.GradientTransformation,
                                 FlowTrainState]:
    k_init, k_train = jax.random.split(key)
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" \
        else jnp.float32
    model = FlowUNet(base=cfg.base_filters, levels=cfg.levels,
                     dtype=dtype)
    dummy = jnp.zeros((1, height, width, 3))
    params = model.init(k_init, dummy, dummy)["params"]
    tx = make_flow_optimizer(cfg)
    state = FlowTrainState(params=params, opt_state=tx.init(params),
                           step=jnp.zeros((), jnp.int32), key=k_train)
    return model, tx, state


def _smoothness(flow: jax.Array) -> jax.Array:
    dx = jnp.abs(flow[:, :, 1:] - flow[:, :, :-1])
    dy = jnp.abs(flow[:, 1:] - flow[:, :-1])
    return jnp.mean(dx) + jnp.mean(dy)


def flow_loss(model: FlowUNet, params, triplet: jax.Array,
              cfg: FlowConfig):
    """``triplet``: (B, 3, H, W, 3) float in [0, 1]."""
    f0, f_mid, f2 = triplet[:, 0], triplet[:, 1], triplet[:, 2]
    f01, f10 = model.apply({"params": params}, f0, f2)
    # exact (unbounded) gather warps in the loss: the fast shift warp
    # clips flow at max_disp, so beyond it the photometric gradient is
    # zero and the net could never learn motion past the bound.  The
    # deployed shift warp stays exact wherever |flow| <= the inference
    # max_disp, so training with the gather warp costs no consistency.
    pred = jax.vmap(time_warp, in_axes=(0, 0, 0, 0, None, None, None))(
        f0, f2, f01, f10, jnp.asarray(0.5, jnp.float32), 0, True)
    l_rec = jnp.mean(jnp.abs(pred - f_mid))
    warp1 = jax.vmap(backward_warp)(f2, f01)
    warp0 = jax.vmap(backward_warp)(f0, f10)
    l_photo = 0.5 * (jnp.mean(jnp.abs(warp1 - f0))
                     + jnp.mean(jnp.abs(warp0 - f2)))
    l_smooth = 0.5 * (_smoothness(f01) + _smoothness(f10))
    total = (l_rec + cfg.w_photo * l_photo + cfg.w_smooth * l_smooth)
    return total, {"loss/rec": l_rec, "loss/photo": l_photo,
                   "loss/smooth": l_smooth, "loss/total": total}


def make_flow_train_step(model: FlowUNet, tx, cfg: FlowConfig):
    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: FlowTrainState, batch):
        frames = batch["frames"]
        triplet = frames.astype(jnp.float32)
        if jnp.issubdtype(frames.dtype, jnp.integer):   # uint8 windows
            triplet = triplet / 255.0

        def loss_fn(p):
            return flow_loss(model, p, triplet, cfg)

        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        metrics["notfinite"] = opt_state.notfinite_count.astype(
            jnp.float32)
        return state.replace(params=params, opt_state=opt_state,
                             step=state.step + 1), metrics

    return train_step
