"""Motion-transformer training: functional, jitted, mesh-sharded.

Replaces the stateful ``MotInterp_Trainer``
(``Human_Motion_Modelling/models/trainer.py:44-225``) with a pure train
step: ``(state, raw_batch, key) -> (state, metrics)``.  The entire AMASS
sample synthesis (view rotation, projection, noise augmentation, masks,
linear prior — the work the reference does per-sample in numpy inside
DataLoader workers) runs *inside* the jitted step via
:func:`renderloom.ops.pose.synthesize_batch`, so the host only ships raw
``(B, 52, 3, L)`` float32 windows to the device and every hot op lands on
the MXU/VPU.

Loss semantics match ``trainer.py:145-160``: masked L1 on the denoised
keyframes (``src_mask``) weighted ``w_codition``, plus masked L1 on the
generated frames (``~(src_mask XOR pad_mask)``), the sum scaled by
``w_2d``.  Optimizer: Adam(amsgrad), β=(0.5, 0.999), global-norm clip 1.0
(``trainer.py:89-95,182-185``); LR stepped per epoch by the configured
policy (``trainer.py:17-38``).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from renderloom.core.config import MotionConfig
from renderloom.models.motion_transformer import (MotionTransformer,
                                                  build_motion_model)
from renderloom.ops import pose as pose_ops
from renderloom.train.schedules import step_schedule


def masked_l1(pred: jax.Array, mask: jax.Array,
              target: jax.Array) -> jax.Array:
    """Masked L1 over (B, C, L) with (B, L) mask, True = excluded.

    Matches ``MaskedL1loss`` (Human_Motion_Modelling/models/losses.py:
    129-153): sum of |pred−target| over unmasked timesteps divided by the
    unmasked count × C.
    """
    not_mask = (~mask.astype(bool)).astype(pred.dtype)[:, None, :]
    n = jnp.sum(not_mask) * pred.shape[1]
    diff = jnp.abs(pred - target) * not_mask
    return jnp.sum(diff) / jnp.maximum(n, 1.0)


def masked_mse(pred: jax.Array, mask: jax.Array,
               target: jax.Array) -> jax.Array:
    """Masked MSE, same normalization (``MaskedMSEloss``,
    losses.py:102-127 — present in the reference's loss library; the
    shipped config trains with L1)."""
    not_mask = (~mask.astype(bool)).astype(pred.dtype)[:, None, :]
    n = jnp.sum(not_mask) * pred.shape[1]
    diff = ((pred - target) ** 2) * not_mask
    return jnp.sum(diff) / jnp.maximum(n, 1.0)


class MotionTrainState(struct.PyTreeNode):
    params: dict
    opt_state: optax.OptState
    step: jax.Array
    key: jax.Array


def make_optimizer(cfg: MotionConfig, steps_per_epoch: int):
    o = cfg.optim
    schedule = step_schedule(o.lr, o.lr_policy, steps_per_epoch, o.gamma,
                             o.step_size, o.warmup)
    tx = optax.chain(
        optax.clip_by_global_norm(o.grad_clip),
        optax.amsgrad(learning_rate=schedule, b1=o.beta1, b2=o.beta2),
    )
    # skip (and count) non-finite-gradient steps instead of poisoning
    # params; hard-error after 10 consecutive (failure detection,
    # SURVEY.md §5.3 — absent in the reference)
    return optax.apply_if_finite(tx, max_consecutive_errors=10)


def splice_amsgrad_state(opt_state, count: int, mu, nu, nu_max):
    """Return ``opt_state`` with its amsgrad moments replaced.

    Used to resume from the reference's ``opt_epochNNN.pth``
    (``Human_Motion_Modelling/models/trainer.py:100-118``): the
    surrounding clip/apply_if_finite/schedule states keep their fresh
    values (torch has no equivalents), only the Adam moments and step
    count carry over.  Walks the (named)tuple state tree so it is
    robust to optax chain re-ordering."""
    import jax.numpy as jnp

    found = 0

    def walk(node):
        nonlocal found
        if isinstance(node, optax.ScaleByAmsgradState):
            found += 1
            return node._replace(
                count=jnp.asarray(count, jnp.int32),
                mu=jax.tree.map(jnp.asarray, mu),
                nu=jax.tree.map(jnp.asarray, nu),
                nu_max=jax.tree.map(jnp.asarray, nu_max))
        if isinstance(node, tuple):
            children = [walk(c) for c in node]
            return (type(node)(*children) if hasattr(node, "_fields")
                    else tuple(children))
        return node

    out = walk(opt_state)
    if found != 1:
        raise ValueError(
            f"expected exactly one amsgrad state in the optimizer tree, "
            f"found {found}")
    return out


def create_motion_state(key: jax.Array, cfg: MotionConfig,
                        steps_per_epoch: int = 1):
    """Initialize (model, state)."""
    k_init, k_train = jax.random.split(key)
    model = build_motion_model(cfg)
    L = cfg.dataset.max_seq_length
    src = jnp.zeros((1, L, cfg.transformer.input_joints))
    mask = jnp.zeros((1, L), dtype=bool)
    params = model.init({"params": k_init}, src, mask, src, mask,
                        cfg.dataset.train_sample_rate)["params"]
    tx = make_optimizer(cfg, steps_per_epoch)
    state = MotionTrainState(params=params, opt_state=tx.init(params),
                             step=jnp.zeros((), jnp.int32), key=k_train)
    return model, tx, state


def motion_loss(model: MotionTransformer, params, batch, rate: int,
                w_codition: float, w_2d: float, dropout_key=None):
    """Forward + loss on a synthesized batch dict (values (B, C, L))."""
    src = jnp.transpose(batch["input"], (0, 2, 1))     # (B, L, C)
    tgt = jnp.transpose(batch["interp"], (0, 2, 1))
    src_mask = batch["src_mask"]
    pad_mask = batch["mask"]

    rngs = None if dropout_key is None else {"dropout": dropout_key}
    pred, reco = model.apply({"params": params}, src, src_mask, tgt,
                             pad_mask, rate,
                             deterministic=dropout_key is None, rngs=rngs)
    pred = jnp.transpose(pred, (0, 2, 1))              # back to (B, C, L)
    reco = jnp.transpose(reco, (0, 2, 1))

    gt = batch["data"]
    mask_gen = ~jnp.logical_xor(src_mask.astype(bool), pad_mask.astype(bool))
    loss_reco = masked_l1(reco, src_mask, gt)
    loss_pred = masked_l1(pred, mask_gen, gt)
    total = (w_codition * loss_reco + loss_pred) * w_2d
    metrics = {"loss/denoise": loss_reco, "loss/pose2d": loss_pred,
               "loss/total": total}
    return total, (pred, metrics)


def make_train_step(model: MotionTransformer, tx, cfg: MotionConfig,
                    mean: jax.Array, std: jax.Array,
                    synth: Optional[pose_ops.SynthesisParams] = None):
    """Build the jitted train step over raw 3D motion windows.

    ``raw_batch`` = {"motion3d": (B, 52, 3, L) float32,
                     "pad_mask": (B, L) bool}.
    """
    if synth is None:
        d = cfg.dataset
        synth = pose_ops.SynthesisParams(
            rate=d.train_sample_rate, sample_size=d.train_sample_size,
            rotation_axes=d.rotation_axes, rotation_aug=d.rotation_aug,
            focal=d.focal, depth=d.depth,
            projection_noise=d.projection_noise, border=d.frame_boarder,
            camera=d.camera_project, train_noise=d.train_noise,
            noise_weight=d.noise_weight, noise_rate=d.noise_rate,
            joint_drop_rate=d.joint_drop_rate, flip_rate=d.flip_rate,
            return_3d=d.return_type == "3D")

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: MotionTrainState, raw_batch):
        k_step = jax.random.fold_in(state.key, state.step)
        k_synth, k_drop = jax.random.split(k_step)
        batch = pose_ops.synthesize_batch(
            k_synth, raw_batch["motion3d"], raw_batch["pad_mask"], mean,
            std, synth)

        def loss_fn(params):
            return motion_loss(model, params, batch, synth.rate,
                               cfg.w_codition, cfg.w_2d, k_drop)

        (_, (_, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        metrics["notfinite"] = opt_state.notfinite_count.astype(
            jnp.float32)
        new_state = state.replace(params=params, opt_state=opt_state,
                                  step=state.step + 1)
        return new_state, metrics

    return train_step


def make_eval_step(model: MotionTransformer, cfg: MotionConfig,
                   mean: jax.Array, std: jax.Array, rate: int):
    """Jitted deterministic inference: synthesized eval batch → prediction.

    Mirrors ``Evaluator.infer_h5_file`` (models/evaluator.py:44-79): no
    dropout, fixed viewpoints supplied by the caller via pre-synthesized
    batches.
    """

    @jax.jit
    def eval_step(params, batch):
        src = jnp.transpose(batch["input"], (0, 2, 1))
        tgt = jnp.transpose(batch["interp"], (0, 2, 1))
        pred, reco = model.apply({"params": params}, src,
                                 batch["src_mask"], tgt, batch["mask"],
                                 rate, deterministic=True)
        return (jnp.transpose(pred, (0, 2, 1)),
                jnp.transpose(reco, (0, 2, 1)))

    return eval_step
