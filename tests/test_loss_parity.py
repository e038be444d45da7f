"""Loss-stack parity against the installed torch reference (VERDICT r2
weak #4): identical tensors through both implementations, per-term
assertion.

Renderer side: GANLoss (all four modes, multi-scale averaging),
FeatureMatchingLoss (÷num_scales), MaskedL1loss (9:1 fg blend, batch-sum
÷N), MaskRegulationLoss (3-channel-repeated mask, ÷4HW), PerceptualLoss
(imagenet renorm + vgg19 taps + [1/32..1] weights) and the trainer's
weighted aggregation — ``Pose_Guided_Neural_Rendering/models/losses.py:
31-618``, ``models/trainer.py:197-288``.

Motion side: MaskedL1loss / MaskedMSEloss over (B, C, L) with (B, L)
masks — ``Human_Motion_Modelling/models/losses.py:100-153``,
``models/trainer.py:145-160``.

The reference's two ``models`` trees are namespace packages that collide,
so each losses.py is loaded directly from its file path under a unique
module name (torchvision stubbed — only the pretrained-builder paths
touch it, and the vgg19 test installs a fake builder with known weights).
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from renderloom.train.gan_losses import (feature_matching_loss, gan_loss,
                                         mask_regulation_loss,
                                         masked_l1_image)

PGNR_LOSSES = "/root/reference/Pose_Guided_Neural_Rendering/models/losses.py"
HMM_LOSSES = "/root/reference/Human_Motion_Modelling/models/losses.py"


def _stub_torchvision():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
    return sys.modules["torchvision"]


def _load_ref(path, name):
    _stub_torchvision()
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    return _load_ref(PGNR_LOSSES, "ref_pgnr_losses")


@pytest.fixture(scope="module")
def ref_motion():
    return _load_ref(HMM_LOSSES, "ref_hmm_losses")


def _logit_pyramid(seed, scales=((2, 1, 12, 18), (2, 1, 6, 9))):
    rng = np.random.default_rng(seed)
    return [rng.normal(0, 1.5, s).astype(np.float32) for s in scales]


@pytest.mark.parametrize("mode", ["hinge", "least_square",
                                  "non_saturated", "wasserstein"])
def test_gan_loss_parity(ref, mode):
    outs = _logit_pyramid(0)
    crit = ref.GANLoss(mode)
    cases = [(True, True), (False, True), (True, False)]
    for t_real, dis_update in cases:
        want = crit([torch.from_numpy(o) for o in outs], t_real,
                    dis_update).item()
        got = float(gan_loss([jnp.asarray(o) for o in outs], t_real,
                             dis_update, mode))
        assert got == pytest.approx(want, rel=1e-5, abs=1e-6), \
            (mode, t_real, dis_update)


def test_feature_matching_parity(ref):
    rng = np.random.default_rng(1)
    shapes = [[(2, 8, 16, 24), (2, 16, 8, 12)],
              [(2, 8, 8, 12), (2, 16, 4, 6)],
              [(2, 8, 4, 6)]]
    fake = [[rng.normal(0, 1, s).astype(np.float32) for s in d]
            for d in shapes]
    real = [[rng.normal(0, 1, s).astype(np.float32) for s in d]
            for d in shapes]
    want = ref.FeatureMatchingLoss()(
        [[torch.from_numpy(t) for t in d] for d in fake],
        [[torch.from_numpy(t) for t in d] for d in real]).item()
    got = float(feature_matching_loss(
        [[jnp.asarray(t) for t in d] for d in fake],
        [[jnp.asarray(t) for t in d] for d in real]))
    assert got == pytest.approx(want, rel=1e-5)


def test_renderer_masked_l1_parity(ref):
    rng = np.random.default_rng(2)
    B, H, W = 2, 16, 24
    pred = rng.uniform(-1, 1, (B, 3, H, W)).astype(np.float32)
    tgt = rng.uniform(-1, 1, (B, 3, H, W)).astype(np.float32)
    fg1 = (rng.uniform(0, 1, (B, 1, H, W)) > 0.6).astype(np.float32)
    fg3 = np.repeat(fg1, 3, axis=1)   # trainer.py:175 repeat(1,3,1,1)

    want = ref.MaskedL1loss()(torch.from_numpy(pred),
                              torch.from_numpy(fg3),
                              torch.from_numpy(tgt)).item()
    got = float(masked_l1_image(
        jnp.asarray(pred.transpose(0, 2, 3, 1)),
        jnp.asarray(fg1.transpose(0, 2, 3, 1)),
        jnp.asarray(tgt.transpose(0, 2, 3, 1))))
    assert got == pytest.approx(want, rel=1e-5)

    # all-background edge case: reference returns global/(1+alpha)
    zero = np.zeros_like(fg3)
    want0 = ref.MaskedL1loss()(torch.from_numpy(pred),
                               torch.from_numpy(zero),
                               torch.from_numpy(tgt)).item()
    got0 = float(masked_l1_image(
        jnp.asarray(pred.transpose(0, 2, 3, 1)),
        jnp.asarray(zero[:, :1].transpose(0, 2, 3, 1)),
        jnp.asarray(tgt.transpose(0, 2, 3, 1))))
    assert got0 == pytest.approx(want0, rel=1e-5)


def test_mask_regulation_parity(ref):
    rng = np.random.default_rng(3)
    B, H, W = 2, 16, 24
    mask1 = rng.uniform(0, 1, (B, 1, H, W)).astype(np.float32)
    mask3 = np.repeat(mask1, 3, axis=1)   # trainer.py:184
    prior = rng.uniform(0, 1, (B, H, W)).astype(np.float32)  # unused

    want = ref.MaskRegulationLoss()(torch.from_numpy(mask3),
                                    torch.from_numpy(prior)).item()
    got = float(mask_regulation_loss(
        jnp.asarray(mask1.transpose(0, 2, 3, 1))))
    assert got == pytest.approx(want, rel=1e-5)


def _fake_torchvision_vgg19(seed=0):
    """torchvision vgg19().features layout with random weights."""
    torch.manual_seed(seed)
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    layers, in_ch = [], 3
    for v in cfg:
        if v == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            layers.append(torch.nn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(torch.nn.ReLU(inplace=True))
            in_ch = v
    return torch.nn.Sequential(*layers)


def test_perceptual_parity(ref, tmp_path):
    from renderloom.data.torch_import import vgg19_state_to_npz
    from renderloom.models.perceptual import (DEFAULT_LAYERS,
                                              DEFAULT_WEIGHTS)
    from renderloom.models.perceptual import PerceptualLoss as MyPerceptual

    features = _fake_torchvision_vgg19()

    class _FakeVGG(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.features = features

    tv = _stub_torchvision()
    tv.models.vgg19 = lambda pretrained=True: _FakeVGG()

    ref_loss = ref.PerceptualLoss(network="vgg19",
                                  layers=list(DEFAULT_LAYERS),
                                  weights=list(DEFAULT_WEIGHTS))

    state = {f"features.{i}.weight": p.detach().numpy()
             for i, m in enumerate(features)
             if isinstance(m, torch.nn.Conv2d)
             for p in [m.weight]}
    state.update({f"features.{i}.bias": m.bias.detach().numpy()
                  for i, m in enumerate(features)
                  if isinstance(m, torch.nn.Conv2d)})
    npz = str(tmp_path / "vgg19_features.npz")
    vgg19_state_to_npz(state, npz)
    mine = MyPerceptual(weights_path=npz, require_pretrained=True)

    rng = np.random.default_rng(4)
    pred = rng.uniform(-1, 1, (2, 3, 32, 48)).astype(np.float32)
    tgt = rng.uniform(-1, 1, (2, 3, 32, 48)).astype(np.float32)
    with torch.no_grad():
        want = ref_loss(torch.from_numpy(pred),
                        torch.from_numpy(tgt)).item()
    got = float(mine(jnp.asarray(pred.transpose(0, 2, 3, 1)),
                     jnp.asarray(tgt.transpose(0, 2, 3, 1))))
    assert got == pytest.approx(want, rel=2e-4)


def test_trainer_aggregation_parity(ref):
    """The trainer's weighted totals (trainer.py:197-288) over a fake
    multi-key D pyramid: renderloom's d_losses / g_gan_losses vs the
    same algebra written with the reference loss modules."""
    from renderloom.core.config import RendererConfig
    from renderloom.train.gan import _weights_dict, d_losses, g_gan_losses

    cfg = RendererConfig()
    weights = _weights_dict(cfg)    # fuse 0.0 / raw 1.0 / face, hand 0.1
    rng = np.random.default_rng(5)

    def pyramid(n_scales, n_feats=3):
        return [{"output": rng.normal(0, 1, (2, 1, 8, 12)).astype(
                     np.float32),
                 "features": [rng.normal(0, 1, (2, 4, 8, 12)).astype(
                     np.float32) for _ in range(n_feats)]}
                for _ in range(n_scales)]

    raw = {k: {"fake": pyramid(2 if k in ("fuse", "raw") else 1),
               "real": pyramid(2 if k in ("fuse", "raw") else 1)}
           for k in weights}

    d_out = {k: {"pred_fake": {
                     "output": [jnp.asarray(s["output"])
                                for s in v["fake"]],
                     "features": [[jnp.asarray(f) for f in s["features"]]
                                  for s in v["fake"]]},
                 "pred_real": {
                     "output": [jnp.asarray(s["output"])
                                for s in v["real"]],
                     "features": [[jnp.asarray(f) for f in s["features"]]
                                  for s in v["real"]]}}
             for k, v in raw.items()}

    crit = ref.GANLoss("hinge")
    fm_crit = ref.FeatureMatchingLoss()

    # --- D totals (trainer.py:197-225)
    want_d = 0.0
    for k, v in raw.items():
        fake = [torch.from_numpy(s["output"]) for s in v["fake"]]
        real = [torch.from_numpy(s["output"]) for s in v["real"]]
        want_d += weights[k] * (crit(fake, False, True).item()
                                + crit(real, True, True).item())
    got_d, _ = d_losses(d_out, "hinge", weights)
    assert float(got_d) == pytest.approx(want_d, rel=1e-5)

    # --- G totals (trainer.py:228-288): GAN Σ w_k·(−mean), FM Σ fm_w·FM_k
    want_gan, want_fm = 0.0, 0.0
    for k, v in raw.items():
        fake = [torch.from_numpy(s["output"]) for s in v["fake"]]
        want_gan += weights[k] * crit(fake, True, False).item()
        want_fm += cfg.fm_w * fm_crit(
            [[torch.from_numpy(f) for f in s["features"]]
             for s in v["fake"]],
            [[torch.from_numpy(f) for f in s["features"]]
             for s in v["real"]]).item()
    got_gan, got_fm = g_gan_losses(d_out, "hinge", weights, cfg.fm_w)
    assert float(got_gan) == pytest.approx(want_gan, rel=1e-5, abs=1e-6)
    assert float(got_fm) == pytest.approx(want_fm, rel=1e-5)


def test_motion_masked_losses_parity(ref_motion):
    from renderloom.train.motion import masked_l1, masked_mse

    rng = np.random.default_rng(6)
    B, C, L = 3, 38, 17
    pred = rng.normal(0, 1, (B, C, L)).astype(np.float32)
    tgt = rng.normal(0, 1, (B, C, L)).astype(np.float32)
    mask = rng.uniform(0, 1, (B, L)) > 0.4   # True = masked out

    want_l1 = ref_motion.MaskedL1loss()(
        torch.from_numpy(pred), torch.from_numpy(mask),
        torch.from_numpy(tgt)).item()
    got_l1 = float(masked_l1(jnp.asarray(pred), jnp.asarray(mask),
                             jnp.asarray(tgt)))
    assert got_l1 == pytest.approx(want_l1, rel=1e-5)

    want_mse = ref_motion.MaskedMSEloss()(
        torch.from_numpy(pred), torch.from_numpy(mask),
        torch.from_numpy(tgt)).item()
    got_mse = float(masked_mse(jnp.asarray(pred), jnp.asarray(mask),
                               jnp.asarray(tgt)))
    assert got_mse == pytest.approx(want_mse, rel=1e-5)
