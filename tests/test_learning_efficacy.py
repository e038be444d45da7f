"""Learning-efficacy smokes: training must beat the reference's own
sanity oracles, not just reduce its loss.

* Motion: after brief training on synthetic sinusoid motion, the model's
  MSE on the generated in-between frames must beat the linear-interp
  baseline — the oracle the reference evaluator reports side-by-side
  (Human_Motion_Modelling/models/evaluator.py:115-130).
* Renderer: overfitting one tiny window must make the fused output's
  foreground PSNR exceed the warped-background baseline — the reference's
  OURS_PSNR > DAIN_PSNR criterion
  (Pose_Guided_Neural_Rendering/models/evaluator.py:116-140).
"""

import jax
import jax.numpy as jnp
import numpy as np

from renderloom.core.config import (DiscriminatorConfig, EmbedConfig,
                                    GeneratorConfig, MaskNetConfig,
                                    MotionConfig, MotionDatasetConfig,
                                    MotionOptimConfig, PatchDiscConfig,
                                    PosEncodeConfig, RendererConfig,
                                    RendererDataConfig, TransformerConfig)
from renderloom.models.perceptual import PerceptualLoss
from renderloom.ops import pose as pose_ops
from renderloom.train.gan import (create_gan_state, make_gan_train_step,
                                  make_rollout)
from renderloom.train.motion import (create_motion_state, make_train_step,
                                     masked_mse, motion_loss)


def test_motion_training_beats_linear_baseline():
    cfg = MotionConfig(
        transformer=TransformerConfig(hidden_dim=32, nheads=4,
                                      dim_feedforward=64, enc_layers=2,
                                      dec_layers=2, dropout=0.0),
        pos_encode=PosEncodeConfig(hidden_dim=32),
        dataset=MotionDatasetConfig(max_seq_length=33, train_sample_rate=8,
                                    train_sample_size=8, noise_rate=2,
                                    joint_drop_rate=2, flip_rate=1),
        optim=MotionOptimConfig(lr=2e-3),
    )
    L = cfg.dataset.max_seq_length
    model, tx, state = create_motion_state(jax.random.PRNGKey(0), cfg)
    mean = jnp.zeros((19, 2))
    std = jnp.ones((19, 2))
    synth = pose_ops.SynthesisParams(
        rate=8, sample_size=8, noise_rate=2, joint_drop_rate=2,
        flip_rate=1)
    step = make_train_step(model, tx, cfg, mean, std, synth)

    t = jnp.linspace(0, 4 * jnp.pi, L)
    base = jnp.stack([jnp.sin(t + i * 0.3) for i in range(52 * 3)])
    motion = base.reshape(1, 52, 3, L).repeat(4, axis=0) * 0.5
    batch = {"motion3d": motion,
             "pad_mask": jnp.zeros((4, L), dtype=bool)}

    # crossover vs the linear baseline happens around step ~100 on this
    # task; 250 gives a comfortable margin (~20 ms/step on 1 CPU core)
    for _ in range(250):
        state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss/total"]))

    # held-out synthesis (fresh viewpoint + noise draw), deterministic fwd
    eval_batch = pose_ops.synthesize_batch(
        jax.random.PRNGKey(777), batch["motion3d"], batch["pad_mask"],
        mean, std, synth)
    _, (pred, _) = motion_loss(model, state.params, eval_batch,
                               synth.rate, cfg.w_codition, cfg.w_2d)
    mask_gen = ~jnp.logical_xor(eval_batch["src_mask"].astype(bool),
                                eval_batch["mask"].astype(bool))
    mse_model = float(masked_mse(pred, mask_gen, eval_batch["data"]))
    mse_linear = float(masked_mse(eval_batch["interp"], mask_gen,
                                  eval_batch["data"]))
    assert np.isfinite(mse_model)
    assert mse_model < mse_linear, (
        f"model MSE {mse_model:.5f} does not beat linear baseline "
        f"{mse_linear:.5f} (reference oracle, evaluator.py:115-130)")


# ---------------------------------------------------------------------
# renderer: OURS_PSNR > DAIN_PSNR on an overfit window
# ---------------------------------------------------------------------

RH, RW = 32, 48


def _renderer_cfg():
    return RendererConfig(
        gen=GeneratorConfig(
            num_filters=8, max_num_filters=32, num_layers=6,
            num_downsamples=3, do_checkpoint=False,
            mask=MaskNetConfig(num_filters=8, max_num_filters=32,
                               num_downsamples=2, num_res_blocks=1),
            embed=EmbedConfig(num_filters=8, max_num_filters=32,
                              num_downsamples=3)),
        dis=DiscriminatorConfig(
            image=PatchDiscConfig(num_filters=4, max_num_filters=16,
                                  num_discriminators=1, num_layers=2),
            use_face=False, use_hand=False),
        data=RendererDataConfig(model_height=RH, model_width=RW,
                                max_frames=3),
    )


def _window():
    """One deterministic 3-frame window: gradient background everywhere;
    GT adds a bright 'human' square whose x position moves per frame;
    labels carry a gaussian blob at the square center."""
    yy, xx = np.mgrid[0:RH, 0:RW].astype(np.float32)
    back1 = (xx / RW + yy / RH) - 1.0          # [-1, 1) gradient
    L = 3
    gt = np.ascontiguousarray(np.broadcast_to(
        back1[None, None, :, :, None], (1, L, RH, RW, 3)))
    back = gt.copy()
    label = np.zeros((1, L, RH, RW, 22), np.float32)
    fg = np.zeros((1, L, RH, RW, 1), np.float32)
    for i in range(L):
        cx, cy = 16 + 6 * i, 16
        sl = np.s_[0, i, cy - 5:cy + 5, cx - 5:cx + 5]
        gt[sl + (slice(None),)] = np.float32([0.9, -0.6, 0.2])
        fg[sl + (0,)] = 1.0
        blob = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * 3.0 ** 2))
        label[0, i, :, :, 3] = blob * 2 - 1
        label[0, i, :, :, 10] = blob * 2 - 1
    return {"label": label, "image": gt.astype(np.float32),
            "back": back.astype(np.float32), "fg_mask": fg}


def _fg_psnr(a, b, m):
    """PSNR on the fg region, images in [-1,1] → [0,1]."""
    a01, b01 = (np.asarray(a) + 1) / 2, (np.asarray(b) + 1) / 2
    mse = float((((a01 - b01) ** 2) * m).sum() / (m.sum() * 3 + 1e-8))
    return 10.0 * np.log10(1.0 / max(mse, 1e-10))


def test_renderer_overfit_beats_background_baseline():
    cfg = _renderer_cfg()
    gen, dis, txs, state = create_gan_state(jax.random.PRNGKey(0), cfg,
                                            height=RH, width=RW)
    step = make_gan_train_step(gen, dis, txs, cfg, PerceptualLoss())
    batch = _window()

    for i in range(40):
        state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["g/total"]))
    assert float(metrics["notfinite/g"]) == 0.0

    rollout = make_rollout(gen, cfg)
    rbatch = {"label": jnp.asarray(batch["label"]),
              "back": jnp.asarray(batch["back"]),
              "key_img": jnp.asarray(batch["image"]),
              "is_key": jnp.asarray([True, False, True])}
    fused, _ = rollout(state.params_g, state.stats_g, rbatch)

    m = batch["fg_mask"][0, 1]
    ours = _fg_psnr(fused[0, 1], batch["image"][0, 1], m)
    dain = _fg_psnr(batch["back"][0, 1], batch["image"][0, 1], m)
    assert ours > dain, (
        f"OURS_PSNR {ours:.2f} dB does not beat DAIN_PSNR {dain:.2f} dB "
        "(reference criterion, evaluator.py:116-140)")
