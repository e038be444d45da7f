"""PoseNet training on HumanSloMo (image, pose) pairs.

Targets are the framework's own on-device gaussian heatmaps
(``ops.rasterize.gaussian_heatmaps`` — the exact rasterizer the renderer
conditions on) drawn at heatmap resolution; the loss is sigmoid-MSE
against them, masked per joint by label confidence, plus a small
soft-argmax coordinate loss for sub-pixel accuracy.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from renderloom.core.config import PoseNetConfig
from renderloom.models.posenet import (N_JOINTS, STRIDE, PoseNet,
                                       decode_heatmaps)
from renderloom.ops.rasterize import gaussian_heatmaps


class PoseTrainState(struct.PyTreeNode):
    params: dict
    opt_state: optax.OptState
    step: jax.Array
    key: jax.Array


def make_pose_optimizer(cfg: PoseNetConfig):
    tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip),
                     optax.adam(cfg.lr))
    return optax.apply_if_finite(tx, max_consecutive_errors=10)


def create_pose_state(key: jax.Array, cfg: PoseNetConfig,
                      height: int = 64, width: int = 64
                      ) -> Tuple[PoseNet, optax.GradientTransformation,
                                 PoseTrainState]:
    k_init, k_train = jax.random.split(key)
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" \
        else jnp.float32
    model = PoseNet(base=cfg.base_filters, blocks=cfg.blocks, dtype=dtype)
    params = model.init(k_init, jnp.zeros((1, height, width, 3)))["params"]
    tx = make_pose_optimizer(cfg)
    return model, tx, PoseTrainState(params=params,
                                     opt_state=tx.init(params),
                                     step=jnp.zeros((), jnp.int32),
                                     key=k_train)


def pose_loss(model: PoseNet, params, images: jax.Array,
              poses: jax.Array, cfg: PoseNetConfig):
    """``images``: (B, H, W, 3) [0,1]; ``poses``: (B, 19, 3) image-pixel
    (x, y, conf)."""
    B, H, W, _ = images.shape
    logits = model.apply({"params": params}, images)
    h, w = H // STRIDE, W // STRIDE

    coords = poses[..., :2] / STRIDE - 0.5        # heatmap-cell coords
    conf = poses[..., 2]                          # (B, J)
    sigma = jnp.full((N_JOINTS,), cfg.sigma / STRIDE)
    target = jax.vmap(
        lambda c, cf: gaussian_heatmaps(c, cf, h, w, sigma)
    )(coords, conf)
    target = jnp.transpose(target, (0, 2, 3, 1))  # (B, h, w, J)

    valid = (conf > cfg.conf_thres).astype(jnp.float32)
    vmap_ = valid[:, None, None, :]               # (B,1,1,J)
    # plain MSE on linear heatmaps, foreground-weighted (the 19 peak
    # cells would otherwise drown in h*w background zeros)
    weight = (1.0 + cfg.fg_weight * target) * vmap_
    l_heat = jnp.sum(((logits - target) ** 2) * weight) \
        / jnp.maximum(jnp.sum(weight), 1.0)

    kps, _ = decode_heatmaps(logits)
    l_coord = jnp.sum(jnp.abs(kps - poses[..., :2])
                      * valid[..., None]) \
        / jnp.maximum(jnp.sum(valid) * 2, 1.0) / max(H, W)
    total = l_heat + cfg.w_coord * l_coord
    return total, {"loss/heat": l_heat, "loss/coord": l_coord,
                   "loss/total": total}


def random_erase(key: jax.Array, images: jax.Array, count: int,
                 rate: float, frac: float) -> jax.Array:
    """Occlusion augmentation: ``count`` random flat-color rectangles
    per image, each drawn with probability ``rate``, up to ``frac`` of
    the image side.  Pose targets are NOT edited — the head must infer
    hidden joints from context, which is exactly the occluded-joint
    regime the demo eval flagged (BASELINE.md pose section).  Static
    shapes: rectangles are broadcast iota masks, fully jittable."""
    B, H, W, _ = images.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (1, H, W, 1), 1)
    xs = jax.lax.broadcasted_iota(jnp.float32, (1, H, W, 1), 2)
    for i in range(count):
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        wh = jax.random.uniform(k1, (B, 2), minval=0.1,
                                maxval=max(frac, 0.1))
        bh, bw = wh[:, 0] * H, wh[:, 1] * W            # box size px
        cyx = jax.random.uniform(k2, (B, 2))
        cy, cx = cyx[:, 0] * H, cyx[:, 1] * W
        on = (jax.random.uniform(k3, (B,)) < rate)
        color = jax.random.uniform(k4, (B, 1, 1, 3))
        def exp(v):
            return v[:, None, None, None]
        inside = ((jnp.abs(ys - exp(cy)) < exp(bh) / 2)
                  & (jnp.abs(xs - exp(cx)) < exp(bw) / 2)
                  & exp(on))
        images = jnp.where(inside, color, images)
    return images


def make_pose_train_step(model: PoseNet, tx, cfg: PoseNetConfig):
    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: PoseTrainState, batch):
        images = batch["images"].astype(jnp.float32)
        if jnp.issubdtype(batch["images"].dtype, jnp.integer):
            images = images / 255.0
        if cfg.occlude_rate > 0.0:
            # fold the step counter in: state.key is stable across the
            # run (checkpoint-compatible), the per-step stream is not
            k_aug = jax.random.fold_in(state.key, state.step)
            images = random_erase(k_aug, images, cfg.occlude_count,
                                  cfg.occlude_rate, cfg.occlude_frac)

        def loss_fn(p):
            return pose_loss(model, p, images, batch["poses"], cfg)

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
