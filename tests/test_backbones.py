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
    # inception's five stride-2 stages need ~75px+ inputs (as torch)
    h, w = (96, 128) if net == "inception_v3" else (64, 96)
    out = model.apply(variables, jnp.zeros((2, h, w, 3)))
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


def test_inception_import_roundtrip():
    """The torchvision-schema loader inverts the module layout: dump the
    flax init back to torch naming, reload, assert tree equality."""
    from renderloom.models.backbones import load_inception_state

    model, variables, layers, _ = build_backbone("inception_v3")
    state = {}

    def walk(params, stats, prefix):
        for k, v in params.items():
            path = f"{prefix}.{k}" if prefix else k
            if k == "conv":
                state[f"{prefix}.conv.weight"] = np.transpose(
                    np.asarray(v["kernel"]), (3, 2, 0, 1))
            elif k == "bn":
                state[f"{prefix}.bn.weight"] = np.asarray(v["scale"])
                state[f"{prefix}.bn.bias"] = np.asarray(v["bias"])
                st = stats["bn"]
                state[f"{prefix}.bn.running_mean"] = np.asarray(st["mean"])
                state[f"{prefix}.bn.running_var"] = np.asarray(st["var"])
            else:
                walk(v, stats.get(k, {}), path)

    walk(variables["params"], variables["batch_stats"], "")
    reloaded = load_inception_state(state)

    flat_a = jax.tree_util.tree_leaves_with_path(variables["params"])
    flat_b = jax.tree_util.tree_leaves_with_path(reloaded["params"])
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(sorted(flat_a, key=lambda kv: str(kv[0])),
                                  sorted(flat_b, key=lambda kv: str(kv[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_allclose(va, vb, err_msg=str(pa))


def test_robust_resnet50_unwraps_prefixes():
    from renderloom.models.backbones import load_robust_resnet50_state

    state = _tv_resnet50_state(np.random.default_rng(1))
    wrapped = {f"module.model.{k}": v for k, v in state.items()}
    variables = load_robust_resnet50_state(wrapped)
    model = build_backbone("robust_resnet50")[0]
    out = model.apply(variables, jnp.zeros((1, 64, 64, 3)) + 0.1)
    assert set(out) == set(BACKBONES["robust_resnet50"][2])


def test_vgg_face_parity_vs_torch():
    """VGG-Face trunk+classifier vs a hand-built torch equivalent of the
    reference's Sequential (losses.py:440-495) with identical weights —
    proves the NCHW-ordered flatten before fc6 and the tap table."""
    torch = pytest.importorskip("torch")
    from renderloom.models.backbones import load_vgg_face_state

    torch.manual_seed(0)
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    feats, in_ch = [], 3
    for v in cfg:
        if v == "M":
            feats.append(torch.nn.MaxPool2d(2, 2))
        else:
            feats.append(torch.nn.Conv2d(in_ch, v, 3, padding=1))
            feats.append(torch.nn.ReLU())
            in_ch = v
    features = torch.nn.Sequential(*feats)
    fc6 = torch.nn.Linear(25088, 4096)
    fc7 = torch.nn.Linear(4096, 4096)
    fc8 = torch.nn.Linear(4096, 2622)

    state = {f"features.{i}.weight": m.weight.detach().numpy()
             for i, m in enumerate(features)
             if isinstance(m, torch.nn.Conv2d)}
    state.update({f"features.{i}.bias": m.bias.detach().numpy()
                  for i, m in enumerate(features)
                  if isinstance(m, torch.nn.Conv2d)})
    for idx, fc in (("0", fc6), ("3", fc7), ("6", fc8)):
        state[f"classifier.{idx}.weight"] = fc.weight.detach().numpy()
        state[f"classifier.{idx}.bias"] = fc.bias.detach().numpy()

    variables = load_vgg_face_state(state)
    model, _, layers, _ = build_backbone("vgg_face_dag")

    rng = np.random.default_rng(2)
    x = rng.normal(0, 0.5, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        h = features(torch.from_numpy(x))
        h = torch.nn.AdaptiveAvgPool2d((7, 7))(h)
        t_avg = h
        h = h.reshape(h.shape[0], -1)
        t_fc6 = fc6(h)
        t_fc7 = fc7(torch.relu(t_fc6))
        t_fc8 = fc8(torch.relu(t_fc7))

    out = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out["avgpool"]),
        t_avg.numpy().transpose(0, 2, 3, 1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["fc6"]), t_fc6.numpy(),
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(out["fc7"]), t_fc7.numpy(),
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(out["fc8"]), t_fc8.numpy(),
                               atol=3e-4)


def test_perceptual_loss_alt_network():
    p = PerceptualLoss(network="alexnet")
    assert len(p.layers) == len(p.weights) == 5
    x = np.zeros((1, 64, 64, 3), np.float32)
    val = float(p(x, x + 0.2))
    assert np.isfinite(val) and val > 0


def test_perceptual_alt_network_requires_weights():
    with pytest.raises(RuntimeError, match="alexnet"):
        PerceptualLoss(network="alexnet", require_pretrained=True)
