"""Renderer h5 evaluation protocol on a tiny synthetic HumanSlomo h5
(``Pose_Guided_Neural_Rendering/models/evaluator.py:48-163``): rollout at
sample_rate 2, fg-masked PSNR/SSIM (+LPIPS) for fused output vs the
warped-background baseline."""

import io

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from renderloom.core.config import (DiscriminatorConfig, EmbedConfig,
                                    GeneratorConfig, MaskNetConfig,
                                    PatchDiscConfig, RendererConfig,
                                    RendererDataConfig)
from renderloom.data.hsm import HsmReader
from renderloom.eval.render_eval import evaluate_h5
from renderloom.models.perceptual import PerceptualLoss
from renderloom.train.gan import create_gan_state

H, W = 64, 96


def _png(im):
    b = io.BytesIO()
    Image.fromarray(im).save(b, format="PNG")
    return np.frombuffer(b.getvalue(), dtype=np.uint8)


@pytest.fixture(scope="module")
def hsm_h5(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("hsm") / "HumanSlomo.h5")
    rng = np.random.default_rng(0)
    with h5py.File(path, "w") as f:
        grp = f.create_group("test_clip")
        vlen = h5py.vlen_dtype(np.uint8)
        n = 7
        for key in ("gt_images", "gt_dain"):
            ims = rng.integers(0, 256, (n, H, W, 3), dtype=np.uint8)
            ds = grp.create_dataset(key, (n,), dtype=vlen)
            for i in range(n):
                ds[i] = _png(ims[i])
        poses = rng.uniform(5, 60, (n, 19, 3))
        poses[:, :, 2] = 0.9
        grp.create_dataset("gt_poses", data=poses)
    return path


def tiny_cfg():
    return RendererConfig(
        gen=GeneratorConfig(
            num_filters=4, max_num_filters=16, num_layers=6,
            num_downsamples=4, do_checkpoint=False,
            mask=MaskNetConfig(num_filters=4, max_num_filters=16,
                               num_downsamples=3, num_res_blocks=1),
            embed=EmbedConfig(num_filters=4, max_num_filters=16,
                              num_downsamples=4)),
        dis=DiscriminatorConfig(
            image=PatchDiscConfig(num_filters=4, max_num_filters=16,
                                  num_discriminators=1, num_layers=2),
            use_face=False, use_hand=False),
        data=RendererDataConfig(model_width=W, model_height=H,
                                load_width=W, load_height=H,
                                test_video_list=("test_clip",),
                                eval_frames=3))


def test_evaluate_h5_protocol(hsm_h5):
    cfg = tiny_cfg()
    reader = HsmReader(hsm_h5, cfg.data.test_video_list, phase="test")
    gen, _, _, state = create_gan_state(jax.random.PRNGKey(0), cfg,
                                        height=H, width=W)
    results = evaluate_h5(gen, state, cfg, reader, max_keyframes=3)
    for key in ("DAIN_PSNR", "DAIN_SSIM", "OURS_PSNR", "OURS_SSIM"):
        assert key in results and np.isfinite(results[key]), results
    # gt_dain here IS random noise unrelated to gt_images: PSNR of the
    # baseline must be low but positive; SSIM in [-1, 1]
    assert 0 < results["DAIN_PSNR"] < 40
    assert -1.0 <= results["DAIN_SSIM"] <= 1.0


def test_evaluate_h5_with_lpips(hsm_h5):
    cfg = tiny_cfg()
    reader = HsmReader(hsm_h5, cfg.data.test_video_list, phase="test")
    gen, _, _, state = create_gan_state(jax.random.PRNGKey(0), cfg,
                                        height=H, width=W)
    results = evaluate_h5(gen, state, cfg, reader, max_keyframes=2,
                          perceptual=PerceptualLoss())
    assert np.isfinite(results["OURS_LPIPS"])
    assert np.isfinite(results["DAIN_LPIPS"])
    assert results["DAIN_LPIPS"] > 0


def test_evaluate_h5_writes_grid_video(hsm_h5, tmp_path):
    cfg = tiny_cfg()
    reader = HsmReader(hsm_h5, cfg.data.test_video_list, phase="test")
    gen, _, _, state = create_gan_state(jax.random.PRNGKey(0), cfg,
                                        height=H, width=W)
    vdir = str(tmp_path / "videos")
    evaluate_h5(gen, state, cfg, reader, max_keyframes=2, video_dir=vdir)
    import os
    files = os.listdir(vdir)
    assert len(files) == 1 and files[0].startswith("test_clip")


def test_chunked_rollout_matches_single_shot():
    from renderloom.train.gan import make_rollout, rollout_chunked

    cfg = tiny_cfg()
    gen, _, _, state = create_gan_state(jax.random.PRNGKey(0), cfg,
                                        height=H, width=W)
    rollout = make_rollout(gen, cfg)
    rng = np.random.default_rng(0)
    L = 11
    batch = {
        "label": jnp.asarray(rng.uniform(-1, 1, (1, L, H, W, 22)),
                             jnp.float32),
        "back": jnp.asarray(rng.uniform(-1, 1, (1, L, H, W, 3)),
                            jnp.float32),
        "key_img": jnp.asarray(rng.uniform(-1, 1, (1, L, H, W, 3)),
                               jnp.float32),
        "is_key": jnp.asarray(np.arange(L) % 2 == 0),
    }
    f_full, m_full = rollout(state.params_g, state.stats_g, batch)
    f_chunk, m_chunk = rollout_chunked(rollout, state.params_g,
                                       state.stats_g, batch, chunk=4)
    np.testing.assert_allclose(np.asarray(f_chunk), np.asarray(f_full),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m_chunk), np.asarray(m_full),
                               rtol=1e-5, atol=1e-5)
