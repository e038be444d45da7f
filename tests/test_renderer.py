"""Renderer stack: shapes, GAN train step, rollout, crops, losses.

SURVEY.md §4 levels 3-4 for the renderer: model shape/jit checks and a
training smoke test (losses finite, parameters move, spectral stats
update), plus unit tests of the loss functions against hand-computed
values.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from renderloom.core.config import (DiscriminatorConfig, EmbedConfig,
                                    GeneratorConfig, MaskNetConfig,
                                    PatchDiscConfig, RendererConfig,
                                    RendererDataConfig)
from renderloom.models.perceptual import PerceptualLoss
from renderloom.models.renderer import Generator, composite
from renderloom.ops.crops import face_crop, hand_crops
from renderloom.train.gan import (create_gan_state, make_gan_train_step,
                                  make_rollout)
from renderloom.train.gan_losses import (feature_matching_loss, gan_loss,
                                         mask_regulation_loss,
                                         masked_l1_image)

H, W = 64, 96


def tiny_cfg():
    return RendererConfig(
        gen=GeneratorConfig(
            num_filters=4, max_num_filters=32, num_layers=6,
            num_downsamples=4,
            mask=MaskNetConfig(num_filters=4, max_num_filters=32,
                               num_downsamples=3, num_res_blocks=2),
            embed=EmbedConfig(num_filters=4, max_num_filters=32,
                              num_downsamples=4)),
        dis=DiscriminatorConfig(
            image=PatchDiscConfig(num_filters=4, max_num_filters=32,
                                  num_discriminators=2, num_layers=2),
            face=PatchDiscConfig(num_filters=4, max_num_filters=32,
                                 num_discriminators=1, num_layers=2),
            hand=PatchDiscConfig(num_filters=4, max_num_filters=32,
                                 num_discriminators=1, num_layers=2)),
        data=RendererDataConfig(model_width=W, model_height=H))


@pytest.fixture(scope="module")
def gan_setup():
    cfg = tiny_cfg()
    gen, dis, txs, state = create_gan_state(jax.random.PRNGKey(0), cfg,
                                            height=H, width=W)
    return cfg, gen, dis, txs, state


def make_batch(B=2, L=4):
    rng = np.random.default_rng(0)
    return {
        "label": rng.uniform(-1, 1, (B, L, H, W, 22)).astype(np.float32),
        "image": rng.uniform(-1, 1, (B, L, H, W, 3)).astype(np.float32),
        "back": rng.uniform(-1, 1, (B, L, H, W, 3)).astype(np.float32),
        "fg_mask": (rng.uniform(0, 1, (B, L, H, W, 1)) > 0.5
                    ).astype(np.float32),
    }


def test_generator_forward_shapes(gan_setup):
    cfg, gen, _, _, state = gan_setup
    B = 2
    label = jnp.zeros((B, H, W, 22))
    img = jnp.zeros((B, H, W, 3))
    out, _ = gen.apply(
        {"params": state.params_g, "batch_stats": state.stats_g},
        label, label, img, img, update_stats=False,
        mutable=["batch_stats"])
    gen_img, mask = out
    assert gen_img.shape == (B, H, W, 3)
    assert mask.shape == (B, H, W, 1)
    # tanh / sigmoid ranges
    assert float(jnp.abs(gen_img).max()) <= 1.0
    assert 0.0 <= float(mask.min()) and float(mask.max()) <= 1.0


def test_gan_train_step_updates_everything(gan_setup):
    cfg, gen, dis, txs, state = gan_setup
    step = make_gan_train_step(gen, dis, txs, cfg, PerceptualLoss())
    batch = make_batch()
    # the train step donates its input state buffers — feed it a copy so
    # the module-scoped fixture state stays alive for other tests
    donated = jax.tree.map(jnp.array, state)
    new_state, metrics = step(donated, batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    # both parameter sets moved
    delta_g = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                           state.params_g, new_state.params_g)
    delta_d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                           state.params_d, new_state.params_d)
    assert max(jax.tree.leaves(delta_g)) > 0
    assert max(jax.tree.leaves(delta_d)) > 0
    # spectral power-iteration state updated
    if jax.tree.leaves(state.stats_g):
        ds = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                          state.stats_g, new_state.stats_g)
        assert max(jax.tree.leaves(ds)) > 0
    assert int(new_state.step) == int(state.step) + 1


def test_rollout_keyframe_passthrough(gan_setup):
    cfg, gen, _, _, state = gan_setup
    rollout = make_rollout(gen, cfg)
    B, L = 1, 6
    rng = np.random.default_rng(1)
    batch = {
        "label": rng.uniform(-1, 1, (B, L, H, W, 22)).astype(np.float32),
        "back": rng.uniform(-1, 1, (B, L, H, W, 3)).astype(np.float32),
        "key_img": rng.uniform(-1, 1, (B, L, H, W, 3)).astype(np.float32),
        "is_key": np.arange(L) % 2 == 0,
    }
    fused, masks = rollout(state.params_g, state.stats_g, batch)
    assert fused.shape == (B, L, H, W, 3)
    # even frames = exact pass-through with zero mask (evaluator.py:94-97)
    np.testing.assert_allclose(np.asarray(fused[:, 0]),
                               batch["key_img"][:, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(fused[:, 2]),
                               batch["key_img"][:, 2], atol=1e-6)
    assert float(jnp.abs(masks[:, 0]).max()) == 0.0
    # odd frames are generated (differ from inputs)
    assert float(jnp.abs(fused[:, 1] - batch["key_img"][:, 1]).max()) > 1e-3


def test_composite_formula():
    g = jnp.full((1, 4, 4, 3), 1.0)
    b = jnp.full((1, 4, 4, 3), -1.0)
    m = jnp.full((1, 4, 4, 1), 0.25)
    out = composite(g, m, b)
    np.testing.assert_allclose(np.asarray(out),
                               0.25 * 1.0 + 0.75 * -1.0, atol=1e-6)


def test_hinge_loss_values():
    logits = jnp.array([[2.0, -2.0]])
    # D real: mean(relu(1-x)) = (0 + 3)/2
    assert abs(float(gan_loss([logits], True, True)) - 1.5) < 1e-6
    # D fake: mean(relu(1+x)) = (3 + 0)/2
    assert abs(float(gan_loss([logits], False, True)) - 1.5) < 1e-6
    # G: -mean(x) = 0
    assert abs(float(gan_loss([logits], True, False))) < 1e-6


def test_masked_l1_image_alpha_blend():
    pred = jnp.ones((1, 2, 2, 3)) * 2.0
    tgt = jnp.zeros((1, 2, 2, 3))
    fg = jnp.zeros((1, 2, 2, 1)).at[0, 0, 0].set(1.0)
    # global = 2; masked = sum(|2|*3 px) / 3 = 2 → (9*2+2)/10 = 2
    loss = masked_l1_image(pred, fg, tgt)
    assert abs(float(loss) - 2.0) < 1e-6


def test_mask_regulation_zero_for_zero_mask():
    m = jnp.zeros((1, 8, 8, 1))
    assert float(mask_regulation_loss(m)) == 0.0
    m1 = jnp.ones((1, 8, 8, 1))
    # gradients 0, L1 = 64, ×3 channel repeat (trainer.py:184) →
    # 3·64/(8·8·4) = 0.75
    assert abs(float(mask_regulation_loss(m1)) - 0.75) < 1e-6


def test_face_crop_shapes_and_fallback():
    B = 2
    label = jnp.zeros((B, H, W, 22))
    # sample 0: put a nose heatmap blob; sample 1: empty (fallback path)
    ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    blob = jnp.exp(-(((xs - 40.0) ** 2 + (ys - 20.0) ** 2) / 30.0))
    label = label.at[0, :, :, 3].set(blob)
    img = jnp.broadcast_to(
        jnp.arange(W, dtype=jnp.float32)[None, None, :, None] / W,
        (B, H, W, 3))
    crops = face_crop(img, label)
    S = H // 32 * 8
    assert crops.shape == (B, S, S, 3)
    assert np.isfinite(np.asarray(crops)).all()


def test_hand_crops_validity():
    B = 1
    label = jnp.zeros((B, H, W, 22))
    ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    blob = jnp.exp(-(((xs - 60.0) ** 2 + (ys - 30.0) ** 2) / 20.0))
    label = label.at[0, :, :, 20].set(blob)    # joint 17 (channel -2)
    img = jnp.ones((B, H, W, 3))
    crops, valid = hand_crops(img, label)
    S = H // 64 * 8
    assert crops.shape == (B, 2, S, S, 3)
    assert bool(valid[0, 0]) and not bool(valid[0, 1])


def test_feature_matching_loss_formula():
    f = [[jnp.ones((1, 2, 2, 1))], [jnp.ones((1, 2, 2, 1)) * 3.0]]
    r = [[jnp.zeros((1, 2, 2, 1))], [jnp.zeros((1, 2, 2, 1))]]
    # (1 + 3) / 2 scales = 2
    assert abs(float(feature_matching_loss(f, r)) - 2.0) < 1e-6


def test_generator_bfloat16_compute_path():
    """bf16 compute (fp32 params/norm stats) — the TPU bench config —
    must produce finite outputs close to the fp32 path."""
    import dataclasses

    cfg32 = tiny_cfg()
    cfg16 = dataclasses.replace(cfg32, compute_dtype="bfloat16")
    gen16, _, _, st = create_gan_state(jax.random.PRNGKey(0), cfg16,
                                       height=H, width=W)
    gen32 = Generator(cfg32.gen, jnp.float32)
    b = make_batch(B=1, L=1)
    args = (jnp.asarray(b["label"][:, 0]), jnp.asarray(b["label"][:, 0]),
            jnp.asarray(b["back"][:, 0]), jnp.asarray(b["back"][:, 0]))
    img16, mask16 = gen16.apply(
        {"params": st.params_g, "batch_stats": st.stats_g}, *args)
    img32, mask32 = gen32.apply(
        {"params": st.params_g, "batch_stats": st.stats_g}, *args)
    # outputs stay in the compute dtype — the HBM-bound train scan
    # streams them at half width; inference composites promote to fp32
    assert img16.dtype == jnp.bfloat16
    assert mask16.dtype == jnp.bfloat16
    assert img32.dtype == jnp.float32
    assert np.isfinite(np.asarray(img16, dtype=np.float32)).all()
    assert np.abs(np.asarray(img16, dtype=np.float32)
                  - np.asarray(img32)).mean() < 0.1
    assert np.abs(np.asarray(mask16, dtype=np.float32)
                  - np.asarray(mask32)).mean() < 0.1


def test_segment_rollout_matches_sequential(gan_setup):
    from renderloom.train.gan import make_segment_rollout

    cfg, gen, _, _, state = gan_setup
    rate, K = 4, 3
    L = (K - 1) * rate + 1
    rng = np.random.default_rng(3)
    batch = {
        "label": jnp.asarray(rng.uniform(-1, 1, (1, L, H, W, 22)),
                             jnp.float32),
        "back": jnp.asarray(rng.uniform(-1, 1, (1, L, H, W, 3)),
                            jnp.float32),
        "key_img": jnp.asarray(rng.uniform(-1, 1, (1, L, H, W, 3)),
                               jnp.float32),
    }
    seq = make_rollout(gen, cfg)
    par = make_segment_rollout(gen, cfg, rate)
    is_key = jnp.asarray(np.arange(L) % rate == 0)
    f_seq, m_seq = seq(state.params_g, state.stats_g,
                       dict(batch, is_key=is_key))
    f_par, m_par = par(state.params_g, state.stats_g, batch)
    # 5e-5: one-pass instance-norm moments reduce in a different order
    # between the segment-folded batch and the sequential one
    np.testing.assert_allclose(np.asarray(f_par), np.asarray(f_seq),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(m_par), np.asarray(m_seq),
                               atol=5e-5)


def test_segment_rollout_chunked_matches_unchunked(gan_setup):
    from renderloom.train.gan import (make_segment_rollout,
                                      segment_rollout_chunked)

    cfg, gen, _, _, state = gan_setup
    rate, K = 2, 6
    L = (K - 1) * rate + 1
    rng = np.random.default_rng(5)
    batch = {
        "label": jnp.asarray(rng.uniform(-1, 1, (1, L, H, W, 22)),
                             jnp.float32),
        "back": jnp.asarray(rng.uniform(-1, 1, (1, L, H, W, 3)),
                            jnp.float32),
        "key_img": jnp.asarray(rng.uniform(-1, 1, (1, L, H, W, 3)),
                               jnp.float32),
    }
    par = make_segment_rollout(gen, cfg, rate)
    f_full, m_full = par(state.params_g, state.stats_g, batch)
    f_chunk, m_chunk = segment_rollout_chunked(
        par, state.params_g, state.stats_g, batch, rate, seg_chunk=2)
    np.testing.assert_allclose(np.asarray(f_chunk), np.asarray(f_full),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(m_chunk), np.asarray(m_full),
                               atol=1e-6)


def test_folded_spectral_norm_matches_training_generator(gan_setup):
    from renderloom.train.gan import (fold_spectral_norm,
                                      make_inference_generator)

    cfg, gen, _, _, state = gan_setup
    rng = np.random.default_rng(9)
    label = jnp.asarray(rng.uniform(-1, 1, (1, H, W, 22)), jnp.float32)
    img = jnp.asarray(rng.uniform(-1, 1, (1, H, W, 3)), jnp.float32)

    ref_img, ref_mask = gen.apply(
        {"params": state.params_g, "batch_stats": state.stats_g},
        label, label, img, img, update_stats=False)

    folded = fold_spectral_norm(state.params_g, state.stats_g)
    inf_gen = make_inference_generator(cfg)
    out_img, out_mask = inf_gen.apply({"params": folded}, label, label,
                                      img, img, update_stats=False)
    np.testing.assert_allclose(np.asarray(out_img), np.asarray(ref_img),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_mask),
                               np.asarray(ref_mask), atol=1e-5)


def test_gan_train_step_with_ssim_term(gan_setup):
    """ssim_w>0 adds a finite fg-masked 1-SSIM term to the G loss (the
    demo's fix for losing SSIM to the warped-background baseline,
    BASELINE.md round-4 GAN demo); 0.0 (default) keeps reference
    parity with no g/ssim metric."""
    import dataclasses

    cfg, gen, dis, txs, state = gan_setup
    cfg_s = dataclasses.replace(cfg, ssim_w=8.0)
    step = make_gan_train_step(gen, dis, txs, cfg_s, PerceptualLoss())
    donated = jax.tree.map(jnp.array, state)
    new_state, metrics = step(donated, make_batch())
    assert "g/ssim" in metrics
    v = float(metrics["g/ssim"])
    assert np.isfinite(v) and 0.0 <= v <= 2.0 * cfg_s.ssim_w
    delta_g = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                           state.params_g, new_state.params_g)
    assert max(jax.tree.leaves(delta_g)) > 0


def test_gan_train_step_with_grad_term(gan_setup):
    """grad_w>0 adds a finite fg-masked image-gradient L1 to the G loss
    (the round-5 follow-up after the direct 1−SSIM term measured
    negative at w=8 and w=2 — BASELINE.md round-5 GAN-demo table);
    0.0 (default) keeps reference parity with no g/grad metric."""
    import dataclasses

    cfg, gen, dis, txs, state = gan_setup
    cfg_g = dataclasses.replace(cfg, grad_w=30.0)
    step = make_gan_train_step(gen, dis, txs, cfg_g, PerceptualLoss())
    donated = jax.tree.map(jnp.array, state)
    new_state, metrics = step(donated, make_batch())
    assert "g/grad" in metrics
    v = float(metrics["g/grad"])
    assert np.isfinite(v) and v >= 0.0
    delta_g = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                           state.params_g, new_state.params_g)
    assert max(jax.tree.leaves(delta_g)) > 0

    # default: no grad metric
    step0 = make_gan_train_step(gen, dis, txs, cfg, PerceptualLoss())
    _, m0 = step0(jax.tree.map(jnp.array, state), make_batch())
    assert "g/grad" not in m0
