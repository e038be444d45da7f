"""Alternate perceptual backbones (reference losses.py:189-202 zoo):
shape/tap contracts, torchvision-schema import, PerceptualLoss wiring.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from renderloom.models.backbones import (BACKBONES, build_backbone,
                                         load_alexnet_state,
                                         load_resnet50_state,
                                         load_vgg16_state)
from renderloom.models.perceptual import PerceptualLoss


@pytest.mark.parametrize("net", sorted(BACKBONES))
def test_backbone_taps_and_shapes(net):
    model, variables, layers, pre = build_backbone(net)
    assert not pre
    out = model.apply(variables, jnp.zeros((2, 64, 96, 3)))
    assert set(out) == set(layers)
    for v in out.values():
        assert v.shape[0] == 2
        assert np.isfinite(np.asarray(v)).all()


def _tv_vgg16_state(rng):
    chans = {1: 64, 2: 128, 3: 256, 4: 512, 5: 512}
    from renderloom.models.backbones import VGG16_CONV_IDX

    state, prev = {}, 3
    for name, idx in sorted(VGG16_CONV_IDX.items(), key=lambda kv: kv[1]):
        ch = chans[int(name.split("_")[1])]
        state[f"features.{idx}.weight"] = rng.normal(
            0, 0.05, (ch, prev, 3, 3)).astype(np.float32)
        state[f"features.{idx}.bias"] = np.zeros(ch, np.float32)
        prev = ch
    return state


def test_vgg16_import_and_forward():
    state = _tv_vgg16_state(np.random.default_rng(0))
    variables = load_vgg16_state(state)
    model = build_backbone("vgg16")[0]
    out = model.apply(variables, jnp.zeros((1, 32, 32, 3)) + 0.3)
    assert set(out) == set(BACKBONES["vgg16"][2])
    # imported kernel is HWIO of the torch OIHW
    k = variables["params"]["conv_1_1"]["kernel"]
    np.testing.assert_allclose(
        k, state["features.0.weight"].transpose(2, 3, 1, 0))


def test_alexnet_import_schema():
    rng = np.random.default_rng(0)
    specs = [(0, 64, 3, 11), (3, 192, 64, 5), (6, 384, 192, 3),
             (8, 256, 384, 3), (10, 256, 256, 3)]
    state = {}
    for idx, out, inp, k in specs:
        state[f"features.{idx}.weight"] = rng.normal(
            0, 0.05, (out, inp, k, k)).astype(np.float32)
        state[f"features.{idx}.bias"] = np.zeros(out, np.float32)
    variables = load_alexnet_state(state)
    model = build_backbone("alexnet")[0]
    out = model.apply(variables, jnp.zeros((1, 64, 64, 3)))
    assert set(out) == set(BACKBONES["alexnet"][2])


def _tv_resnet50_state(rng):
    state = {}

    def conv(name, o, i, k):
        state[f"{name}.weight"] = rng.normal(0, 0.05,
                                             (o, i, k, k)).astype(
                                                 np.float32)

    def bn(name, c):
        state[f"{name}.weight"] = np.ones(c, np.float32)
        state[f"{name}.bias"] = np.zeros(c, np.float32)
        state[f"{name}.running_mean"] = np.zeros(c, np.float32)
        state[f"{name}.running_var"] = np.ones(c, np.float32)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    inp = 64
    for s, (mid, blocks) in enumerate(
            [(64, 3), (128, 4), (256, 6), (512, 3)], 1):
        for b in range(blocks):
            p = f"layer{s}.{b}"
            conv(f"{p}.conv1", mid, inp, 1)
            bn(f"{p}.bn1", mid)
            conv(f"{p}.conv2", mid, mid, 3)
            bn(f"{p}.bn2", mid)
            conv(f"{p}.conv3", mid * 4, mid, 1)
            bn(f"{p}.bn3", mid * 4)
            if b == 0:
                conv(f"{p}.downsample.0", mid * 4, inp, 1)
                bn(f"{p}.downsample.1", mid * 4)
            inp = mid * 4
    return state


def test_resnet50_import_and_forward():
    state = _tv_resnet50_state(np.random.default_rng(0))
    variables = load_resnet50_state(state)
    model = build_backbone("resnet50")[0]
    out = model.apply(variables, jnp.zeros((1, 64, 64, 3)) + 0.1)
    assert set(out) == set(BACKBONES["resnet50"][2])
    assert out["layer_4"].shape == (1, 2, 2, 2048)


def test_perceptual_loss_alt_network():
    p = PerceptualLoss(network="alexnet")
    assert len(p.layers) == len(p.weights) == 5
    x = np.zeros((1, 64, 64, 3), np.float32)
    val = float(p(x, x + 0.2))
    assert np.isfinite(val) and val > 0


def test_perceptual_alt_network_requires_weights():
    with pytest.raises(RuntimeError, match="alexnet"):
        PerceptualLoss(network="alexnet", require_pretrained=True)
