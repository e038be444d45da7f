"""Parity-layout fast path == MaskGenerator to float tolerance.

The fast path (renderloom/models/fastpath.py) is an exact TPU execution
strategy for the blend-mask net (generator.py:415-510 workload): every
weight transform (s2d stride-1/stride-2 conv, upsample+conv collapse,
parity-averaged instance-norm stats) must reproduce the standard flax
forward bit-near-exactly on the same folded parameters.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from renderloom.core.config import RendererConfig
from renderloom.models.fastpath import (depth_to_space, mask_apply_fast,
                                        space_to_depth,
                                        transform_mask_params, w_s1_s2d,
                                        w_s2_s2d, w_up_d2s)
from renderloom.models.layers import upsample2x
from renderloom.models.renderer import MaskGenerator


def _mask_cfg():
    cfg = RendererConfig().gen
    return dataclasses.replace(
        cfg, mask=dataclasses.replace(cfg.mask, weight_norm_type="none"))


def test_s2d_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 12, 5)),
                    jnp.float32)
    np.testing.assert_array_equal(depth_to_space(space_to_depth(x)), x)


def _conv_ref(x, k, stride=1):
    p = 1
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("cin,cout", [(3, 7), (8, 4)])
def test_w_s1_s2d_exact(cin, cout):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 10, 14, cin)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)), jnp.float32)
    ref = _conv_ref(x, k)
    got = depth_to_space(
        jax.lax.conv_general_dilated(
            space_to_depth(x), w_s1_s2d(k), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_w_s2_s2d_exact():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 12, 16, 5)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 5, 9)), jnp.float32)
    ref = _conv_ref(x, k, stride=2)
    got = jax.lax.conv_general_dilated(
        space_to_depth(x), w_s2_s2d(k), (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_w_up_d2s_exact():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 6, 9, 5)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 5, 4)), jnp.float32)
    ref = _conv_ref(upsample2x(x), k)
    got = depth_to_space(
        jax.lax.conv_general_dilated(
            x, w_up_d2s(k), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_embed_fast_matches_flax():
    from renderloom.models.fastpath import (embed_apply_fast,
                                            transform_embed_params)
    from renderloom.models.renderer import LabelEmbedder
    cfg = _mask_cfg()
    cfg = dataclasses.replace(
        cfg, embed=dataclasses.replace(cfg.embed,
                                       weight_norm_type="none"))
    emb = LabelEmbedder(cfg, jnp.float32)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 48, 6)), jnp.float32)
    variables = emb.init(jax.random.PRNGKey(0), x)
    ref = emb.apply(variables, x)
    tp = transform_embed_params(variables["params"],
                                cfg.embed.num_downsamples)
    got = embed_apply_fast(tp, x, jnp.float32,
                           cfg.embed.num_downsamples)
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=2e-5)


@pytest.mark.parametrize("packed_levels", [1, 2, 3, 4])
def test_trunk_fast_matches_flax(packed_levels):
    from renderloom.models.fastpath import (embed_apply_fast,
                                            transform_embed_params,
                                            transform_trunk_params,
                                            trunk_apply_fast)
    from renderloom.models.renderer import Generator
    cfg = _mask_cfg()
    cfg = dataclasses.replace(
        cfg, weight_norm_type="none", do_checkpoint=False,
        embed=dataclasses.replace(cfg.embed, weight_norm_type="none"))
    gen = Generator(cfg, jnp.float32)
    rng = np.random.default_rng(8)
    B, H, W = 2, 32, 48
    label = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 22)), jnp.float32)
    warped = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 3)), jnp.float32)
    prev = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 3)), jnp.float32)
    variables = gen.init(jax.random.PRNGKey(1), label, label, warped,
                         prev)
    ref_img, _ = gen.apply(variables, label, label, warped, prev)
    p = variables["params"]
    etp = transform_embed_params(p["ref_embed"],
                                 cfg.embed.num_downsamples)
    ttp = transform_trunk_params(p, cfg, packed_levels)
    cond, cond_packed = embed_apply_fast(
        etp, jnp.concatenate([warped, prev], axis=-1), jnp.float32,
        cfg.embed.num_downsamples, return_packed=True)
    got = trunk_apply_fast(ttp, label, cond, cond_packed, jnp.float32,
                           cfg, packed_levels)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_img),
                               atol=3e-5)


@pytest.mark.parametrize("packed_levels", ["1", "2"])
def test_fast_gen_matches_flax_rollout(monkeypatch, packed_levels):
    """FastInferenceGen through the segment rollout == standard path
    (at every RENDERLOOM_PACKED_LEVELS depth)."""
    monkeypatch.setenv("RENDERLOOM_PACKED_LEVELS", packed_levels)
    from renderloom.core.config import (EmbedConfig, MaskNetConfig,
                                        RendererConfig)
    from renderloom.core.config import GeneratorConfig as GC
    from renderloom.train.gan import (create_gan_state,
                                      make_inference_pair,
                                      make_segment_rollout)

    H, W, B, rate, K = 32, 48, 1, 2, 3
    cfg = RendererConfig(gen=GC(
        num_filters=4, max_num_filters=16, num_layers=6,
        num_downsamples=4, do_checkpoint=False,
        mask=MaskNetConfig(num_filters=4, max_num_filters=16,
                           num_downsamples=3, num_res_blocks=2),
        embed=EmbedConfig(num_filters=4, max_num_filters=16,
                          num_downsamples=4)))
    _, _, _, state = create_gan_state(jax.random.PRNGKey(0), cfg,
                                      height=H, width=W)
    rng = np.random.default_rng(5)
    L = (K - 1) * rate + 1
    batch = {
        "label": jnp.asarray(rng.uniform(-1, 1, (B, L, H, W, 22)),
                             jnp.float32),
        "back": jnp.asarray(rng.uniform(-1, 1, (B, L, H, W, 3)),
                            jnp.float32),
        "key_img": jnp.asarray(rng.uniform(-1, 1, (B, L, H, W, 3)),
                               jnp.float32),
    }
    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("RENDERLOOM_FASTPATH", flag)
        gen, folded = make_inference_pair(cfg, state.params_g,
                                          state.stats_g)
        rollout = make_segment_rollout(gen, cfg, rate)
        fused, masks = rollout(folded, {}, batch)
        outs[flag] = (np.asarray(fused), np.asarray(masks))
    np.testing.assert_allclose(outs["1"][0], outs["0"][0], atol=3e-5)
    np.testing.assert_allclose(outs["1"][1], outs["0"][1], atol=3e-5)


def test_fast_gen_consumes_packed_labels(monkeypatch):
    """Feeding the rollout a pre-packed (B,L,H/2,W/2,88) label — the
    fused rasterizer's ``layout='packed'`` output — is exact vs the
    standard path on the plain NHWC label."""
    monkeypatch.setenv("RENDERLOOM_PACKED_LEVELS", "1")
    from renderloom.core.config import (EmbedConfig, MaskNetConfig,
                                        RendererConfig)
    from renderloom.core.config import GeneratorConfig as GC
    from renderloom.train.gan import (create_gan_state,
                                      make_inference_pair,
                                      make_segment_rollout)

    H, W, B, rate, K = 32, 48, 1, 2, 3
    cfg = RendererConfig(gen=GC(
        num_filters=4, max_num_filters=16, num_layers=6,
        num_downsamples=4, do_checkpoint=False,
        mask=MaskNetConfig(num_filters=4, max_num_filters=16,
                           num_downsamples=3, num_res_blocks=2),
        embed=EmbedConfig(num_filters=4, max_num_filters=16,
                          num_downsamples=4)))
    _, _, _, state = create_gan_state(jax.random.PRNGKey(0), cfg,
                                      height=H, width=W)
    rng = np.random.default_rng(6)
    L = (K - 1) * rate + 1
    label = jnp.asarray(rng.uniform(-1, 1, (B, L, H, W, 22)), jnp.float32)
    batch = {
        "label": label,
        "back": jnp.asarray(rng.uniform(-1, 1, (B, L, H, W, 3)),
                            jnp.float32),
        "key_img": jnp.asarray(rng.uniform(-1, 1, (B, L, H, W, 3)),
                               jnp.float32),
    }
    monkeypatch.setenv("RENDERLOOM_FASTPATH", "0")
    gen, folded = make_inference_pair(cfg, state.params_g, state.stats_g)
    ref_fused, ref_masks = make_segment_rollout(gen, cfg, rate)(
        folded, {}, batch)

    monkeypatch.setenv("RENDERLOOM_FASTPATH", "1")
    packed = space_to_depth(label.reshape((B * L, H, W, 22))) \
        .reshape((B, L, H // 2, W // 2, 88))
    gen, folded = make_inference_pair(cfg, state.params_g, state.stats_g)
    fused, masks = make_segment_rollout(gen, cfg, rate)(
        folded, {}, dict(batch, label=packed))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref_fused),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(masks), np.asarray(ref_masks),
                               atol=3e-5)


def test_mask_fast_matches_flax():
    cfg = _mask_cfg()
    mask = MaskGenerator(cfg, jnp.float32)
    rng = np.random.default_rng(4)
    B, H, W = 2, 32, 48
    label = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 22)), jnp.float32)
    imgs = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 9)), jnp.float32)
    variables = mask.init(jax.random.PRNGKey(0), label, imgs)
    ref = mask.apply(variables, label, imgs)
    tp = transform_mask_params(variables["params"])
    got = mask_apply_fast(tp, label, imgs)
    assert got.shape == ref.shape == (B, H, W, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5)
