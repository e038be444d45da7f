"""Renderer GAN training: per-frame alternating D/G updates in a scan.

Rebuild of ``Pose_Guided_Neural_Rendering/models/trainer.py:43-293`` as a
single jitted step.  The reference's python frame loop — generate frame
i+1 autoregressively from the previous *detached* fused output, update D
on the detached composite, then update G through the *updated* D — maps
to one ``lax.scan`` over the frame axis whose carry holds both parameter
sets, both optimizer states and the previous fused frame
(trainer.py:157-193; SURVEY.md §7 "hard parts" #2).

Loss semantics (trainer.py:197-288, weights configs/HSM.yaml:107-148):

* D: hinge on each output key, total = Σ w_key·(L_real + L_fake),
  w = {fuse: 0.0, raw: 1.0, face: 0.1, hand: 0.1};
* G: Σ w_key·(−mean D_fake) + fm_w·Σ FM_key
  + 10·(VGG(fuse, real) + VGG(gen·fg, real·fg))
  + 30·(L1(fuse, real) + MaskedL1(gen, fg, real)) + 5·mask-reg;
* two Adam(amsgrad) optimizers, TTUR (G 1e-4 / D 4e-4, β=(0, 0.999)).

Gradients never flow across frames (prev fuse is stop_gradient'ed, as in
the reference where ``.detach()`` is called on every carried tensor).
Data parallel: batch axis sharded over the mesh ``data`` axis; params and
optimizer states replicated — XLA inserts the gradient all-reduce.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from renderloom.core.config import RendererConfig
from renderloom.models.discriminator import DiscriminatorSet
from renderloom.models.perceptual import PerceptualLoss
from renderloom.models.renderer import Generator, composite
from renderloom.train.gan_losses import (feature_matching_loss, gan_loss,
                                         mask_regulation_loss,
                                         masked_l1_image)
from renderloom.train.schedules import step_schedule


class GanTrainState(struct.PyTreeNode):
    params_g: dict
    params_d: dict
    stats_g: dict          # spectral-norm power-iteration state
    stats_d: dict
    opt_g: optax.OptState
    opt_d: optax.OptState
    step: jax.Array
    key: jax.Array


def make_gan_optimizers(cfg: RendererConfig, steps_per_epoch: int = 1):
    o = cfg.optim
    sched_g = step_schedule(o.lr, o.lr_policy, steps_per_epoch, o.gamma,
                            o.step_size)
    sched_d = step_schedule(o.lr_d, o.lr_policy, steps_per_epoch, o.gamma,
                            o.step_size)
    tx_g = optax.amsgrad(learning_rate=sched_g, b1=o.beta1, b2=o.beta2)
    tx_d = optax.amsgrad(learning_rate=sched_d, b1=o.beta1, b2=o.beta2)
    # failure detection the reference lacks (SURVEY.md §5.3): a non-finite
    # gradient (GAN instability, bf16 overflow) skips the update instead
    # of poisoning the params; persistent blow-ups still error out after
    # max_consecutive_errors so they can't pass silently
    tx_g = optax.apply_if_finite(tx_g, max_consecutive_errors=10)
    tx_d = optax.apply_if_finite(tx_d, max_consecutive_errors=10)
    return tx_g, tx_d


def create_gan_state(key: jax.Array, cfg: RendererConfig,
                     steps_per_epoch: int = 1,
                     height: Optional[int] = None,
                     width: Optional[int] = None):
    """Initialize generator + discriminator + optimizers."""
    H = height or cfg.data.model_height
    W = width or cfg.data.model_width
    k_g, k_d, k_train = jax.random.split(key, 3)
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" \
        else jnp.float32
    gen = Generator(cfg.gen, dtype)
    dis = DiscriminatorSet(cfg.dis, dtype)

    label = jnp.zeros((1, H, W, cfg.gen.input_label_nc))
    img = jnp.zeros((1, H, W, cfg.gen.input_image_nc))
    fg = jnp.zeros((1, H, W, 1))

    vars_g = gen.init(k_g, label, label, img, img)
    vars_d = dis.init(k_d, label, img, img, img, fg)

    tx_g, tx_d = make_gan_optimizers(cfg, steps_per_epoch)
    state = GanTrainState(
        params_g=vars_g["params"],
        params_d=vars_d["params"],
        stats_g=vars_g.get("batch_stats", {}),
        stats_d=vars_d.get("batch_stats", {}),
        opt_g=tx_g.init(vars_g["params"]),
        opt_d=tx_d.init(vars_d["params"]),
        step=jnp.zeros((), jnp.int32),
        key=k_train,
    )
    return gen, dis, (tx_g, tx_d), state


def _weights_dict(cfg: RendererConfig) -> Dict[str, float]:
    g = cfg.gan
    w = {"fuse": g.fuse, "raw": g.raw}
    if cfg.dis.use_face:
        w["face"] = g.face
    if cfg.dis.use_hand:
        w["hand"] = g.hand
    return w


def d_losses(d_out: Dict, mode: str, weights: Dict[str, float]):
    """Σ w_key·(hinge_real + hinge_fake) (trainer.py:197-225)."""
    per_key = {}
    for key, out in d_out.items():
        wgt = out.get("weight")
        loss = (gan_loss(out["pred_fake"]["output"], False, True, mode,
                         wgt)
                + gan_loss(out["pred_real"]["output"], True, True, mode,
                           wgt))
        per_key[key] = loss
    total = sum(per_key[k] * weights[k] for k in per_key)
    return total, per_key


def g_gan_losses(d_out: Dict, mode: str, weights: Dict[str, float],
                 fm_w: float):
    """G-side GAN + feature-matching totals (trainer.py:228-288)."""
    gan_total = 0.0
    fm_total = 0.0
    for key, out in d_out.items():
        wgt = out.get("weight")
        gan_total = gan_total + weights[key] * gan_loss(
            out["pred_fake"]["output"], True, False, mode, wgt)
        fm_total = fm_total + fm_w * feature_matching_loss(
            out["pred_fake"]["features"], out["pred_real"]["features"],
            wgt)
    return gan_total, fm_total


def make_gan_train_step(gen: Generator, dis: DiscriminatorSet,
                        txs, cfg: RendererConfig,
                        perceptual: PerceptualLoss,
                        data_cfg=None, fused_raster: bool = False):
    """Build the jitted multi-frame train step.

    ``batch`` (all NHWC, frame axis second): label (B,L,H,W,22),
    image (B,L,H,W,3), back (B,L,H,W,3), fg_mask (B,L,H,W,1), all
    float32 in [-1,1] (masks in {0,1}).

    With ``data_cfg`` set, the step instead takes RAW reader windows
    ({"images","dain","poses"} uint8/float) and runs the full on-device
    preparation (affine augment, rasterization, background pipeline —
    :func:`renderloom.data.hsm.prepare_batch`) INSIDE the same jit,
    consuming ``state.key``: host→device traffic shrinks to the raw
    bytes (~30× less than prepared 22-channel labels) and the prep is
    data-parallel over the mesh along with the step itself.
    """
    tx_g, tx_d = txs
    mode = cfg.gan_mode
    weights = _weights_dict(cfg)
    vgg_vars = perceptual.variables
    vgg = perceptual

    def g_forward(params_g, stats_g, label, label_prev, back, img_prev,
                  update):
        out, new_vars = gen.apply(
            {"params": params_g, "batch_stats": stats_g},
            label, label_prev, back, img_prev, update_stats=update,
            mutable=["batch_stats"] if update else [])
        img, mask = out
        new_stats = new_vars.get("batch_stats", stats_g) if update \
            else stats_g
        return img, mask, new_stats

    def d_forward(params_d, stats_d, label, real, fake, raw, fg, update):
        out, new_vars = dis.apply(
            {"params": params_d, "batch_stats": stats_d},
            label, real, fake, raw, fg, update_stats=update,
            mutable=["batch_stats"] if update else [])
        new_stats = new_vars.get("batch_stats", stats_d) if update \
            else stats_d
        return out, new_stats

    def frame_step(carry, xs):
        (params_g, params_d, stats_g, stats_d, opt_g, opt_d,
         prev_fuse) = carry
        label = xs["label"]
        label_prev = xs["label_prev"]
        back = xs["back"]
        real = xs["real"]
        fg = xs["fg"]

        img_prev = jax.lax.stop_gradient(prev_fuse)

        # --- ONE G forward per frame, like the reference: torch runs a
        # single train-mode forward (power iteration included) and uses
        # its detached outputs for the D update, then backprops the same
        # graph for the G update (trainer.py:157-193).  jax.vjp gives us
        # exactly that: outputs + a pullback, no duplicate forward.
        def g_fwd(p_g):
            img, mask, new_sg = g_forward(p_g, stats_g, label, label_prev,
                                          back, img_prev, True)
            return (img, mask), new_sg

        (gen_img, gen_mask), g_vjp, stats_g_new = jax.vjp(
            g_fwd, params_g, has_aux=True)
        fuse = composite(gen_img, gen_mask, back)
        fuse_sg = jax.lax.stop_gradient(fuse)
        gen_sg = jax.lax.stop_gradient(gen_img)

        # --- D update (old D params, detached G outputs)
        def d_loss_fn(p_d):
            d_out, new_sd = d_forward(p_d, stats_d, label, real, fuse_sg,
                                      gen_sg, fg, True)
            total, per_key = d_losses(d_out, mode, weights)
            return total, (per_key, new_sd)

        (d_total, (d_per_key, stats_d_new)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(params_d)
        d_updates, opt_d_new = tx_d.update(d_grads, opt_d, params_d)
        params_d_new = optax.apply_updates(params_d, d_updates)

        # --- G update through the *updated* D (trainer.py:192-193):
        # differentiate the loss stack wrt the G OUTPUTS, then pull the
        # cotangents back through the saved forward
        def g_loss_fn(img, mask):
            fused = composite(img, mask, back)
            d_out, _ = d_forward(params_d_new, stats_d_new, label, real,
                                 fused, img, fg, False)
            loss_gan, loss_fm = g_gan_losses(d_out, mode, weights,
                                             cfg.fm_w)
            loss_perc = (vgg(fused, real) + vgg(img * fg, real * fg)) \
                * cfg.perceptual.weight
            loss_l1 = (jnp.mean(jnp.abs(fused - real), dtype=jnp.float32)
                       + masked_l1_image(img, fg, real)) * cfg.l1_w
            loss_mask = mask_regulation_loss(mask) * cfg.mask_w
            total = loss_gan + loss_fm + loss_perc + loss_l1 + loss_mask
            metrics = {"g/gan": loss_gan, "g/fm": loss_fm,
                       "g/perc": loss_perc, "g/l1": loss_l1,
                       "g/mask": loss_mask}
            if cfg.ssim_w:           # static: off at reference parity
                from renderloom.ops.image import denorm_to_unit, ssim
                loss_ssim = (1.0 - ssim(
                    (denorm_to_unit(fused) * fg).astype(jnp.float32),
                    (denorm_to_unit(real) * fg).astype(jnp.float32))
                ) * cfg.ssim_w
                total = total + loss_ssim
                metrics["g/ssim"] = loss_ssim
            if cfg.grad_w:           # static: off at reference parity
                # fg-masked gradient L1: forward differences of the
                # composite vs GT.  Matches the local contrast SSIM
                # scores without handing the loss a full SSIM objective
                # (which destabilized the GAN at w=8 AND w=2 —
                # BASELINE.md round-5 GAN-demo table).
                fm = (fused * fg).astype(jnp.float32)
                rm = (real * fg).astype(jnp.float32)
                loss_grad = (
                    jnp.mean(jnp.abs(jnp.diff(fm, axis=-3)
                                     - jnp.diff(rm, axis=-3)))
                    + jnp.mean(jnp.abs(jnp.diff(fm, axis=-2)
                                       - jnp.diff(rm, axis=-2)))
                ) * cfg.grad_w
                total = total + loss_grad
                metrics["g/grad"] = loss_grad
            metrics["g/total"] = total
            aux = {"fused": fused, "metrics": metrics}
            return total, aux

        (g_total, aux), out_grads = jax.value_and_grad(
            g_loss_fn, argnums=(0, 1), has_aux=True)(gen_img, gen_mask)
        (g_grads,) = g_vjp(out_grads)
        g_updates, opt_g_new = tx_g.update(g_grads, opt_g, params_g)
        params_g_new = optax.apply_updates(params_g, g_updates)

        metrics = dict(aux["metrics"])
        metrics["d/total"] = d_total
        for k, v in d_per_key.items():
            metrics[f"d/{k}"] = v

        new_carry = (params_g_new, params_d_new, stats_g_new,
                     stats_d_new, opt_g_new, opt_d_new,
                     jax.lax.stop_gradient(aux["fused"]))
        return new_carry, metrics

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: GanTrainState, batch):
        if data_cfg is not None:
            from renderloom.data.hsm import prepare_batch

            key, k_prep = jax.random.split(state.key)
            state = state.replace(key=key)
            batch = prepare_batch(k_prep, batch, data_cfg, train=True,
                                  fused_raster=fused_raster)
        # frame-major: (L, B, H, W, C).  Cast the streamed tensors to the
        # compute dtype ONCE — the scan re-reads them every frame for the
        # D forward, G forward and both backwards, and the step is
        # HBM-bandwidth-bound (VERDICT r2 #1): bf16 halves that traffic.
        # Every conv casts its input to bf16 anyway, so no information
        # the model sees is lost; loss reductions accumulate fp32.
        cdtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" \
            else jnp.float32
        tm = lambda x: jnp.swapaxes(x, 0, 1).astype(cdtype)
        label = tm(batch["label"])
        image = tm(batch["image"])
        back = tm(batch["back"])
        fg = tm(batch["fg_mask"])
        L = label.shape[0]

        xs = {
            "label": label[1:L - 1],
            "label_prev": label[0:L - 2],
            "back": back[1:L - 1],
            "real": image[1:L - 1],
            "fg": fg[1:L - 1],
        }
        carry = (state.params_g, state.params_d, state.stats_g,
                 state.stats_d, state.opt_g, state.opt_d, image[0])
        carry, metrics = jax.lax.scan(frame_step, carry, xs)
        (params_g, params_d, stats_g, stats_d, opt_g, opt_d, _) = carry
        new_state = state.replace(
            params_g=params_g, params_d=params_d, stats_g=stats_g,
            stats_d=stats_d, opt_g=opt_g, opt_d=opt_d,
            step=state.step + 1)
        # average metrics over frames
        metrics = jax.tree.map(jnp.mean, metrics)
        metrics["notfinite/g"] = opt_g.notfinite_count.astype(jnp.float32)
        metrics["notfinite/d"] = opt_d.notfinite_count.astype(jnp.float32)
        return new_state, metrics

    return train_step


def make_rollout(gen: Generator, cfg: RendererConfig):
    """Jitted autoregressive inference rollout (evaluator semantics,
    ``models/evaluator.py:48-147``): keyframes pass through, in-between
    frames are generated from the previous fused output.

    ``batch``: label (B,L,H,W,22), back (B,L,H,W,3), key_img (B,L,H,W,3)
    ground-truth/input frames, ``is_key`` (L,) bool.  Returns fused
    (B,L,H,W,3) and masks (B,L,H,W,1).
    """

    @jax.jit
    def rollout(params_g, stats_g, batch):
        tm = lambda x: jnp.swapaxes(x, 0, 1)
        label = tm(batch["label"])
        back = tm(batch["back"])
        key_img = tm(batch["key_img"])
        is_key = batch["is_key"]
        L = label.shape[0]

        def step(carry, xs):
            prev_fuse, prev_label = carry
            img, mask = gen.apply(
                {"params": params_g, "batch_stats": stats_g},
                xs["label"], prev_label, xs["back"], prev_fuse,
                update_stats=False)
            fused = composite(img, mask, xs["back"])
            # keyframes: pass through the provided frame, zero mask
            # (evaluator.py:94-97)
            k = xs["is_key"]
            fused = jnp.where(k, xs["key_img"], fused)
            mask = jnp.where(k, jnp.zeros_like(mask), mask)
            return (fused, xs["label"]), (fused, mask)

        if "init_fuse" in batch:      # chunked continuation (static)
            init = (batch["init_fuse"], batch["init_label"])
        else:
            init = (key_img[0], label[0])
        xs = {"label": label, "back": back, "key_img": key_img,
              "is_key": is_key.reshape(L, 1, 1, 1, 1)}
        _, (fused, masks) = jax.lax.scan(step, init, xs)
        return tm(fused), tm(masks)

    return rollout


def rollout_chunked(rollout, params_g, stats_g, batch, chunk: int = 64):
    """Run the autoregressive rollout over an arbitrarily long clip in
    fixed-size segments, threading the fused-frame carry between them —
    device memory stays O(chunk), not O(clip length).  Segments are
    padded to ``chunk`` so there are exactly two compiled shapes."""
    L = batch["label"].shape[1]
    if L <= chunk:
        return rollout(params_g, stats_g, batch)

    fused_parts, mask_parts = [], []
    init_fuse = None
    init_label = None
    for start in range(0, L, chunk):
        end = min(start + chunk, L)
        pad = chunk - (end - start)

        def cut(x, time_axis=1):
            seg = jax.lax.slice_in_dim(x, start, end, axis=time_axis)
            if pad:
                last = jax.lax.slice_in_dim(seg, seg.shape[time_axis] - 1,
                                            seg.shape[time_axis],
                                            axis=time_axis)
                reps = [1] * seg.ndim
                reps[time_axis] = pad
                seg = jnp.concatenate([seg, jnp.tile(last, reps)],
                                      axis=time_axis)
            return seg

        seg_batch = {"label": cut(batch["label"]),
                     "back": cut(batch["back"]),
                     "key_img": cut(batch["key_img"]),
                     "is_key": cut(batch["is_key"], time_axis=0)}
        if init_fuse is not None:
            seg_batch["init_fuse"] = init_fuse
            seg_batch["init_label"] = init_label
        fused, masks = rollout(params_g, stats_g, seg_batch)
        valid = end - start
        fused_parts.append(fused[:, :valid])
        mask_parts.append(masks[:, :valid])
        init_fuse = fused[:, valid - 1]
        init_label = seg_batch["label"][:, valid - 1]
    return (jnp.concatenate(fused_parts, axis=1),
            jnp.concatenate(mask_parts, axis=1))


def make_segment_rollout(gen: Generator, cfg: RendererConfig, rate: int):
    """Segment-parallel autoregressive rollout — exact same semantics as
    :func:`make_rollout` for the periodic keyframe pattern
    ``is_key = (t % rate == 0)``, restructured for the MXU.

    The reference evaluator's recursion (``models/evaluator.py:94-114``)
    resets at every keyframe: a keyframe's fused output IS the provided
    key image, independent of history.  The L-frame sequential chain is
    therefore (K-1) *independent* chains of length (rate-1).  Scanning
    ``rate-1`` steps with the segment axis folded into the batch runs
    ~rate× fewer sequential generator calls at (K-1)× larger batch —
    the same FLOPs, massively better utilization on one chip.

    ``batch``: label (B, L, H, W, 22), back (B, L, H, W, 3),
    key_img (B, L, H, W, 3) with L = (K-1)·rate + 1.
    Returns fused (B, L, H, W, 3), masks (B, L, H, W, 1) —
    bit-identical per frame to ``make_rollout`` up to reduction order.
    """

    @jax.jit
    def rollout(params_g, stats_g, batch):
        label, back, key_img = (batch["label"], batch["back"],
                                batch["key_img"])
        B, L = label.shape[:2]
        assert (L - 1) % rate == 0, (L, rate)
        S = (L - 1) // rate                     # segments

        def seg(x):
            # (B, L, ...) -> (rate, B·S, ...): segment s covers frames
            # [s·rate, (s+1)·rate); in-segment index leads for lax.scan
            body = x[:, :S * rate]
            body = body.reshape((B, S, rate) + x.shape[2:])
            body = jnp.moveaxis(body, 2, 0)
            return body.reshape((rate, B * S) + x.shape[2:])

        label_s, back_s, key_s = seg(label), seg(back), seg(key_img)

        def step(carry, xs):
            prev_fuse, prev_label = carry
            img, mask = gen.apply(
                {"params": params_g, "batch_stats": stats_g},
                xs["label"], prev_label, xs["back"], prev_fuse,
                update_stats=False)
            fused = composite(img, mask, xs["back"])
            return (fused, xs["label"]), (fused, mask)

        init = (key_s[0], label_s[0])           # each segment's keyframe
        xs = {"label": label_s[1:], "back": back_s[1:]}
        _, (fused_in, masks_in) = jax.lax.scan(step, init, xs)

        # reassemble: keyframes pass through with zero mask
        fused_seg = jnp.concatenate([key_s[:1], fused_in], axis=0)
        masks_seg = jnp.concatenate(
            [jnp.zeros_like(masks_in[:1]), masks_in], axis=0)

        def unseg(x):
            body = x.reshape((rate, B, S) + x.shape[2:])
            body = jnp.moveaxis(body, 0, 2)
            return body.reshape((B, S * rate) + x.shape[2:])

        fused = jnp.concatenate(
            [unseg(fused_seg), key_img[:, -1:]], axis=1)
        masks = jnp.concatenate(
            [unseg(masks_seg),
             jnp.zeros(key_img[:, -1:].shape[:-1] + (1,),
                       masks_seg.dtype)], axis=1)
        return fused, masks

    return rollout


def segment_rollout_chunked(seg_rollout, params_g, stats_g, batch,
                            rate: int, seg_chunk: int = 16):
    """Chunk :func:`make_segment_rollout` over the segment axis so device
    memory stays O(seg_chunk · rate) frames for arbitrarily long clips.
    Because every chunk starts at a keyframe, no carry crosses chunks
    (unlike :func:`rollout_chunked`) — chunks are pure slices.  Chunks
    are padded to ``seg_chunk`` segments by tiling the final frame, so
    there is exactly one compiled shape."""
    L = batch["label"].shape[1]
    S = (L - 1) // rate
    assert S * rate + 1 == L, (L, rate)
    if S <= seg_chunk:
        return seg_rollout(params_g, stats_g, batch)

    fused_parts, mask_parts = [], []
    for s0 in range(0, S, seg_chunk):
        s1 = min(s0 + seg_chunk, S)
        pad_frames = (seg_chunk - (s1 - s0)) * rate

        def cut(x):
            seg = jax.lax.slice_in_dim(x, s0 * rate, s1 * rate + 1,
                                       axis=1)
            if pad_frames:
                last = jax.lax.slice_in_dim(
                    seg, seg.shape[1] - 1, seg.shape[1], axis=1)
                reps = [1] * seg.ndim
                reps[1] = pad_frames
                seg = jnp.concatenate([seg, jnp.tile(last, reps)],
                                      axis=1)
            return seg

        seg_batch = {k: cut(batch[k])
                     for k in ("label", "back", "key_img")}
        fused, masks = seg_rollout(params_g, stats_g, seg_batch)
        valid = (s1 - s0) * rate + (1 if s1 == S else 0)
        fused_parts.append(fused[:, :valid])
        mask_parts.append(masks[:, :valid])
    return (jnp.concatenate(fused_parts, axis=1),
            jnp.concatenate(mask_parts, axis=1))


def fold_spectral_norm(params: dict, stats: dict) -> dict:
    """Bake spectral normalization into the kernels for inference.

    Training applies ``W / σ`` every forward, re-estimating σ from the
    stored power-iteration ``u`` (flax SpectralNorm).  At inference the
    weights are frozen, so the division can be done ONCE: this walks the
    ``batch_stats`` tree, recomputes σ exactly as flax does (one power
    step from the stored ``u``), and divides the matching kernel.  Using
    the folded params with a ``weight_norm_type='none'`` generator (same
    param tree, no stats) is bit-identical to the spectral one while
    skipping ~hundreds of tiny serial matmuls per forward.
    """

    def sigma_of(kernel, u):
        mat = kernel.reshape(-1, kernel.shape[-1]).astype(jnp.float32)
        v = _l2norm(u.astype(jnp.float32) @ mat.T)
        u1 = _l2norm(v @ mat)
        return (v @ mat @ u1.T)[0, 0]

    def walk(p, s):
        out = {}
        for k, v in p.items():
            sv = s.get(k, {}) if isinstance(s, dict) else {}
            if isinstance(v, dict):
                out[k] = walk(v, sv)
            else:
                out[k] = v
        sn = s.get("sn") if isinstance(s, dict) else None
        if sn and "conv/kernel/u" in sn and "conv" in out:
            sig = sigma_of(out["conv"]["kernel"], sn["conv/kernel/u"])
            sig = jnp.where(sig != 0, sig, 1.0)
            out["conv"] = dict(out["conv"],
                               kernel=out["conv"]["kernel"] / sig)
        return out

    return walk(params, stats)


def _l2norm(x, eps=1e-12):
    return x / jnp.sqrt((x * x).sum() + eps)


def make_inference_generator(cfg: RendererConfig):
    """Spectral-norm-free Generator for rollouts: identical param tree
    (SNConv stores conv params at the same path either way), no
    batch_stats — pair with :func:`fold_spectral_norm`."""
    import dataclasses

    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" \
        else jnp.float32
    gen_cfg = dataclasses.replace(
        cfg.gen, weight_norm_type="none",
        mask=dataclasses.replace(cfg.gen.mask, weight_norm_type="none"),
        embed=dataclasses.replace(cfg.gen.embed,
                                  weight_norm_type="none"))
    return Generator(gen_cfg, dtype)


def make_inference_pair(cfg: RendererConfig, params_g, stats_g):
    """(generator, folded params) for the rollout factories: spectral
    norm folded into the kernels, and — on TPU (see
    ``fastpath.use_fastpath``) — the mask net switched to the exact
    parity-layout fast path with its transformed kernels attached."""
    from renderloom.models.fastpath import (FastInferenceGen,
                                            fold_fast_params,
                                            use_fastpath)
    gen = make_inference_generator(cfg)
    folded = fold_spectral_norm(params_g, stats_g)
    if use_fastpath():
        gen = FastInferenceGen(gen)
        folded = fold_fast_params(folded, cfg.gen)
    return gen, folded
