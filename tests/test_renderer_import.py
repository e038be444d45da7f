"""netG/netD checkpoint import: torch-free mapping into renderloom trees,
with functional parity against the reference torch Generator
(Pose_Guided_Neural_Rendering/models/generator.py) when the reference
tree is importable.  Validates both the importer and the renderer
reimplementation (SPADE trunk, LabelEmbedder, MaskGenerator, spectral
norm semantics) in one shot.
"""

import os
import sys
import types

import jax
import numpy as np
import pytest

from renderloom.core.config import (DiscriminatorConfig, EmbedConfig,
                                    GeneratorConfig, MaskNetConfig,
                                    PatchDiscConfig, RendererConfig,
                                    RendererDataConfig)
from renderloom.data.torch_import import (flatten_state_dict,
                                          map_discriminator_params,
                                          map_generator_params, read_pth)
from renderloom.train.gan import create_gan_state

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference/Pose_Guided_Neural_Rendering"

H, W = 32, 48
NF, MAXF = 4, 16
N_DOWN, N_EMBED_DOWN = 3, 3
MASK_DOWN, MASK_RES = 2, 1


def _my_cfg():
    return RendererConfig(
        gen=GeneratorConfig(
            num_filters=NF, max_num_filters=MAXF, num_layers=6,
            num_downsamples=N_DOWN, do_checkpoint=False,
            mask=MaskNetConfig(num_filters=NF, max_num_filters=MAXF,
                               num_downsamples=MASK_DOWN,
                               num_res_blocks=MASK_RES),
            embed=EmbedConfig(num_filters=NF, max_num_filters=MAXF,
                              num_downsamples=N_EMBED_DOWN)),
        dis=DiscriminatorConfig(
            image=PatchDiscConfig(num_filters=NF, max_num_filters=MAXF,
                                  num_discriminators=2, num_layers=2),
            face=PatchDiscConfig(num_filters=NF, max_num_filters=MAXF,
                                 num_discriminators=1, num_layers=2),
            hand=PatchDiscConfig(num_filters=NF, max_num_filters=MAXF,
                                 num_discriminators=1, num_layers=2)),
        data=RendererDataConfig(model_height=H, model_width=W),
    )


def _easydict():
    class EasyDict(dict):
        def __init__(self, d=None, **kw):
            d = dict(d or {})
            d.update(kw)
            for k, v in d.items():
                setattr(self, k, v)

        def __setattr__(self, name, value):
            if isinstance(value, dict) and not isinstance(value, EasyDict):
                value = EasyDict(value)
            super().__setattr__(name, value)
            self[name] = value
    return EasyDict


def _ref_modules():
    """Import the reference generator/discriminator classes with their
    unavailable host-side deps stubbed out."""
    for mod in ("patoolib", "cv2", "albumentations", "piq"):
        sys.modules.setdefault(mod, types.ModuleType(mod))
    ed_mod = types.ModuleType("easydict")
    ed_mod.EasyDict = _easydict()
    sys.modules.setdefault("easydict", ed_mod)
    sys.path.insert(0, REFERENCE)
    try:
        from models.discriminator import Discriminator
        from models.generator import Generator
    finally:
        sys.path.remove(REFERENCE)
    return Generator, Discriminator


def _ref_gen_cfg():
    ED = _easydict()
    return ED({
        "num_frames_G": 2, "input_image_nc": 3, "input_label_nc": 22,
        "num_filters": NF, "max_num_filters": MAXF, "num_layers": 6,
        # the reference trunk reads num_downsamples_img (default 4,
        # generator.py:50); the yaml's gen.num_downsamples only feeds
        # embed/mask configs
        "num_downsamples": N_DOWN, "num_downsamples_img": N_DOWN,
        "kernel_size": 3,
        "activation_norm_type": "spatially_adaptive",
        "activation_norm_params": {"activation_norm_type": "instance",
                                   "num_filters": 0, "kernel_size": 1},
        "weight_norm_type": "spectral", "do_checkpoint": False,
        "mask": {"generate_raw_output": False, "num_filters": NF,
                 "max_num_filters": MAXF, "num_downsamples": MASK_DOWN,
                 "num_res_blocks": MASK_RES, "kernel_size": 3,
                 "activation_norm_type": "instance",
                 "weight_norm_type": "spectral"},
        "embed": {"use_embed": True, "arch": "encoder",
                  "num_filters": NF, "max_num_filters": MAXF,
                  "num_downsamples": N_EMBED_DOWN, "kernel_size": 3,
                  "weight_norm_type": "spectral"},
    })


def _ref_dis_cfg():
    ED = _easydict()
    patch = {"num_filters": NF, "max_num_filters": MAXF,
             "num_discriminators": 2, "num_layers": 2,
             "weight_norm_type": "spectral",
             "activation_norm_type": "instance"}
    extra = dict(patch, num_discriminators=1)
    return ED({"input_image_nc": 3, "input_label_nc": 22,
               "num_frames_D": 2, "few_shot": False,
               "image": patch,
               "additional_discriminators": {"face": extra,
                                             "hand": extra}})


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference tree not present")
def test_generator_import_parity_vs_reference(tmp_path):
    Generator, _ = _ref_modules()
    torch.manual_seed(0)
    ref = Generator(_ref_gen_cfg())

    rng = np.random.default_rng(0)
    label = rng.normal(0, 1, (2, 22, H, W)).astype(np.float32)
    back = rng.uniform(-1, 1, (2, 3, H, W)).astype(np.float32)
    prev = rng.uniform(-1, 1, (2, 3, H, W)).astype(np.float32)

    # converge the spectral-norm power iterations (torch only updates
    # u/v during train-mode forwards; the published epoch-6 checkpoints
    # are long converged)
    ref.train()
    with torch.no_grad():
        for _ in range(50):
            ref(torch.from_numpy(label), torch.from_numpy(label),
                torch.from_numpy(back), torch.from_numpy(prev))
    ref.eval()
    with torch.no_grad():
        ref_img, ref_mask = ref(torch.from_numpy(label),
                                torch.from_numpy(label),
                                torch.from_numpy(back),
                                torch.from_numpy(prev))

    path = str(tmp_path / "netG_epoch006.pth")
    torch.save(ref.state_dict(), path,
               _use_new_zipfile_serialization=False)
    params_g, stats_g = map_generator_params(
        flatten_state_dict(read_pth(path)))

    cfg = _my_cfg()
    gen, _, _, state = create_gan_state(jax.random.PRNGKey(0), cfg,
                                        height=H, width=W)
    # structural equality with a fresh init
    init_shapes = jax.tree.map(lambda x: tuple(x.shape), state.params_g)
    mapped_shapes = jax.tree.map(lambda x: tuple(x.shape), params_g)
    assert init_shapes == mapped_shapes
    stat_shapes = jax.tree.map(lambda x: tuple(np.shape(x)), state.stats_g)
    mapped_stat_shapes = jax.tree.map(lambda x: tuple(np.shape(x)),
                                      stats_g)
    assert stat_shapes == mapped_stat_shapes

    nhwc = lambda a: np.transpose(a, (0, 2, 3, 1))
    img, mask = gen.apply(
        {"params": params_g, "batch_stats": stats_g},
        nhwc(label), nhwc(label), nhwc(back), nhwc(prev),
        update_stats=False)
    np.testing.assert_allclose(np.asarray(img),
                               nhwc(ref_img.numpy()),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(mask),
                               nhwc(ref_mask.numpy()),
                               atol=2e-3, rtol=1e-3)


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference tree not present")
def test_discriminator_import_tree_matches(tmp_path):
    _, Discriminator = _ref_modules()
    torch.manual_seed(0)
    ref = Discriminator(_ref_dis_cfg())
    path = str(tmp_path / "netD_epoch006.pth")
    torch.save(ref.state_dict(), path,
               _use_new_zipfile_serialization=False)
    params_d, stats_d = map_discriminator_params(
        flatten_state_dict(read_pth(path)))

    cfg = _my_cfg()
    _, dis, _, state = create_gan_state(jax.random.PRNGKey(0), cfg,
                                        height=H, width=W)
    init_shapes = jax.tree.map(lambda x: tuple(x.shape), state.params_d)
    mapped_shapes = jax.tree.map(lambda x: tuple(x.shape), params_d)
    assert init_shapes == mapped_shapes

    # the imported tree must actually run through the DiscriminatorSet
    rng = np.random.default_rng(0)
    mk = lambda c: np.asarray(rng.uniform(-1, 1, (1, H, W, c)),
                              np.float32)
    out = dis.apply({"params": params_d, "batch_stats": stats_d},
                    mk(22), mk(3), mk(3), mk(3),
                    np.ones((1, H, W, 1), np.float32),
                    update_stats=False)
    for leaf in jax.tree.leaves(out):
        assert np.isfinite(np.asarray(leaf)).all()
