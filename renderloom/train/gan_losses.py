"""GAN training losses for the renderer.

Functional jnp ports of the loss semantics in
``Pose_Guided_Neural_Rendering/models/losses.py``:

* hinge / least-square / non-saturated / wasserstein GAN loss, averaged
  per scale then across scales (losses.py:31-133; config uses hinge);
* feature matching: L1 over every D feature, weighted 1/num_scales
  (losses.py:501-531);
* masked L1: ``(9·fg_masked + global) / 10`` (losses.py:537-564);
* mask regularizer: mean L1 of the mask and its x/y image gradients,
  ÷(4HW) (losses.py:567-618);
* VGG-style perceptual loss lives in ``renderloom.models.perceptual``.

Every function optionally takes a per-sample ``weight`` (the hand-crop
validity gate renderloom uses instead of the reference's variable-length
crop batches).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp


def _weighted_mean(x: jax.Array, weight: Optional[jax.Array]) -> jax.Array:
    # inputs may stream in bf16 (HBM-bound train step); accumulate fp32
    if weight is None:
        return jnp.mean(x, dtype=jnp.float32)
    # weight broadcasts over the batch axis
    w = jnp.broadcast_to(weight.reshape((-1,) + (1,) * (x.ndim - 1)),
                         x.shape)
    return (jnp.sum(x * w, dtype=jnp.float32)
            / jnp.maximum(jnp.sum(w, dtype=jnp.float32), 1.0))


def gan_loss_single(logits: jax.Array, t_real: bool, dis_update: bool,
                    mode: str = "hinge",
                    weight: Optional[jax.Array] = None) -> jax.Array:
    """One scale's GAN loss (losses.py:76-113)."""
    # patch logits are tiny tensors; fp32 here costs nothing and keeps
    # the exp/log1p (non_saturated) and squares numerically safe
    logits = logits.astype(jnp.float32)
    if mode == "hinge":
        if dis_update:
            if t_real:
                return _weighted_mean(jax.nn.relu(1.0 - logits), weight)
            return _weighted_mean(jax.nn.relu(1.0 + logits), weight)
        return -_weighted_mean(logits, weight)
    if mode == "least_square":
        target = 1.0 if t_real else 0.0
        return 0.5 * _weighted_mean((logits - target) ** 2, weight)
    if mode == "non_saturated":
        target = jnp.full_like(logits, 1.0 if t_real else 0.0)
        loss = jnp.maximum(logits, 0) - logits * target \
            + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        return _weighted_mean(loss, weight)
    if mode == "wasserstein":
        return (-1.0 if t_real else 1.0) * _weighted_mean(logits, weight)
    raise ValueError(f"unknown gan mode {mode!r}")


def gan_loss(outputs: List[jax.Array], t_real: bool, dis_update: bool,
             mode: str = "hinge",
             weight: Optional[jax.Array] = None) -> jax.Array:
    """Scale-averaged GAN loss (losses.py:62-74)."""
    losses = [gan_loss_single(o, t_real, dis_update, mode, weight)
              for o in outputs]
    return sum(losses) / len(losses)


def feature_matching_loss(fake_feats: List[List[jax.Array]],
                          real_feats: List[List[jax.Array]],
                          weight: Optional[jax.Array] = None) -> jax.Array:
    """Σ_scales Σ_layers L1(fake, stop_grad(real)) / num_scales
    (losses.py:501-531)."""
    num_d = len(fake_feats)
    total = 0.0
    for f_list, r_list in zip(fake_feats, real_feats):
        for f, r in zip(f_list, r_list):
            diff = jnp.abs(f - jax.lax.stop_gradient(r))
            total = total + _weighted_mean(diff, weight) / num_d
    return total


def masked_l1_image(pred: jax.Array, fg_mask: jax.Array,
                    target: jax.Array, alpha: float = 9.0) -> jax.Array:
    """(α·fg-masked + global)/(1+α) L1 (losses.py:537-564).  NHWC;
    fg_mask broadcasts (B,H,W,1)."""
    global_loss = jnp.mean(jnp.abs(pred - target), dtype=jnp.float32)
    mask3 = jnp.broadcast_to(fg_mask, pred.shape)
    n = jnp.sum(mask3, dtype=jnp.float32)
    masked = jnp.sum(jnp.abs(pred * mask3 - target * mask3),
                     dtype=jnp.float32) \
        / jnp.maximum(n, 1.0)
    masked = jnp.where(n < 1, 0.0, masked)
    return (masked * alpha + global_loss) / (1.0 + alpha)


def mask_regulation_loss(mask: jax.Array,
                         fg_mask: Optional[jax.Array] = None,
                         repeat_channels: int = 3) -> jax.Array:
    """(‖∂x m‖₁ + ‖∂y m‖₁ + ‖m‖₁) / 4HW (losses.py:567-618; the fg prior
    argument is unused in the reference too).  ``mask`` is (B,H,W,1).

    The reference trainer feeds the mask REPEATED to the 3 image
    channels (trainer.py:184 ``mask.repeat(1,3,1,1)``) while keeping the
    ÷4HW normalizer, so its loss is 3× the single-channel sums;
    ``repeat_channels`` reproduces that exactly without materializing
    the repeat (verified by tests/test_loss_parity.py)."""
    H, W = mask.shape[1], mask.shape[2]
    dx = mask[:, :, 1:, :] - mask[:, :, :-1, :]
    dy = mask[:, 1:, :, :] - mask[:, :-1, :, :]
    total = (jnp.sum(jnp.abs(dx), dtype=jnp.float32)
             + jnp.sum(jnp.abs(dy), dtype=jnp.float32)
             + jnp.sum(jnp.abs(mask), dtype=jnp.float32))
    return total * repeat_channels / (H * W * 4.0)
