"""Alternate perceptual-loss backbones (reference loss-library parity).

The reference's ``PerceptualLoss`` can run on torchvision vgg16 /
alexnet / resnet50 feature stacks besides the default VGG19
(``Pose_Guided_Neural_Rendering/models/losses.py:189-202``, zoo at
``:331-421``).  These are flax NHWC re-implementations with the same
tap names as the reference's ``layer_name_mapping`` tables, loading
torchvision checkpoints through the torch-free reader
(``renderloom.data.torch_import``).

Excluded (documented in PARITY.md): ``inception_v3`` (requires the
aux-free inference graph + exotic pooling taps), ``robust_resnet50``
(weights only from a personal URL) and ``vgg_face_dag`` (non-torchvision
Oxford weights) — none are reachable without egress, and none are used
by any shipped config.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# (block index, convs in block, channels); vgg16 = torchvision indices
# {1,3,6,8,11,13,15,18,20,22,25} -> relu_B_N (losses.py:331-346)
VGG16_PLAN = [(1, 2, 64), (2, 2, 128), (3, 3, 256), (4, 3, 512),
              (5, 3, 512)]

VGG16_CONV_IDX = {
    "conv_1_1": 0, "conv_1_2": 2,
    "conv_2_1": 5, "conv_2_2": 7,
    "conv_3_1": 10, "conv_3_2": 12, "conv_3_3": 14,
    "conv_4_1": 17, "conv_4_2": 19, "conv_4_3": 21,
    "conv_5_1": 24, "conv_5_2": 26, "conv_5_3": 28,
}


class VGG16Features(nn.Module):
    """vgg16.features trunk emitting relu taps (losses.py:331-346)."""

    layers: Sequence[str] = ("relu_4_1",)

    @nn.compact
    def __call__(self, x) -> Dict[str, jax.Array]:
        taps = {}
        wanted = set(self.layers)
        deepest = max(int(n.split("_")[1]) for n in wanted)
        for block, n_convs, ch in VGG16_PLAN:
            if block > deepest:
                break
            for i in range(1, n_convs + 1):
                x = nn.Conv(ch, (3, 3), padding="SAME",
                            name=f"conv_{block}_{i}")(x)
                x = nn.relu(x)
                if f"relu_{block}_{i}" in wanted:
                    taps[f"relu_{block}_{i}"] = x
            if block < deepest:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


# alexnet.features Sequential: taps conv_N / relu_N (losses.py:349-362)
_ALEXNET_SPECS = [
    # (features-index, out_ch, kernel, stride, pad, maxpool-after)
    (0, 64, 11, 4, 2, True),
    (3, 192, 5, 1, 2, True),
    (6, 384, 3, 1, 1, False),
    (8, 256, 3, 1, 1, False),
    (10, 256, 3, 1, 1, False),
]


class AlexNetFeatures(nn.Module):
    """alexnet.features trunk with conv_N/relu_N taps."""

    layers: Sequence[str] = ("relu_5",)

    @nn.compact
    def __call__(self, x) -> Dict[str, jax.Array]:
        taps = {}
        wanted = set(self.layers)
        deepest = max(int(n.split("_")[1]) for n in wanted)
        for n, (_, ch, k, s, p, pool) in enumerate(_ALEXNET_SPECS, 1):
            if n > deepest:
                break
            x = nn.Conv(ch, (k, k), strides=(s, s),
                        padding=((p, p), (p, p)), name=f"conv_{n}")(x)
            if f"conv_{n}" in wanted:
                taps[f"conv_{n}"] = x
            x = nn.relu(x)
            if f"relu_{n}" in wanted:
                taps[f"relu_{n}"] = x
            if pool and n < deepest:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
        return taps


class _Bottleneck(nn.Module):
    """torchvision resnet Bottleneck (1x1 -> 3x3 -> 1x1, BN frozen to
    inference statistics — the perceptual net is never trained)."""

    mid: int
    stride: int = 1
    project: bool = False

    @nn.compact
    def __call__(self, x):
        def bn(name):
            return nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                                momentum=0.9, name=name)

        h = nn.Conv(self.mid, (1, 1), use_bias=False, name="conv1")(x)
        h = nn.relu(bn("bn1")(h))
        h = nn.Conv(self.mid, (3, 3), strides=(self.stride,) * 2,
                    padding=((1, 1), (1, 1)), use_bias=False,
                    name="conv2")(h)
        h = nn.relu(bn("bn2")(h))
        h = nn.Conv(self.mid * 4, (1, 1), use_bias=False,
                    name="conv3")(h)
        h = bn("bn3")(h)
        if self.project:
            s = nn.Conv(self.mid * 4, (1, 1),
                        strides=(self.stride,) * 2, use_bias=False,
                        name="down_conv")(x)
            s = bn("down_bn")(s)
        else:
            s = x
        return nn.relu(s + h)


_RESNET50_STAGES = [(64, 3), (128, 4), (256, 6), (512, 3)]


class ResNet50Features(nn.Module):
    """torchvision resnet50 trunk with layer_1..layer_4 taps
    (losses.py:395-412)."""

    layers: Sequence[str] = ("layer_4",)

    @nn.compact
    def __call__(self, x) -> Dict[str, jax.Array]:
        taps = {}
        wanted = set(self.layers)
        deepest = max(int(n.split("_")[1]) for n in wanted)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name="conv1")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                                 name="bn1")(x))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        for s, (mid, blocks) in enumerate(_RESNET50_STAGES, 1):
            if s > deepest:
                break
            for b in range(blocks):
                x = _Bottleneck(mid, stride=2 if (b == 0 and s > 1) else 1,
                                project=(b == 0),
                                name=f"layer{s}_{b}")(x)
            if f"layer_{s}" in wanted:
                taps[f"layer_{s}"] = x
        return taps


# ------------------------------------------------------------------
# torchvision state-dict -> flax variables
# ------------------------------------------------------------------

def _conv(w):  # OIHW -> HWIO
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def load_vgg16_state(state: Dict[str, np.ndarray]) -> Dict:
    params = {}
    for name, idx in VGG16_CONV_IDX.items():
        for wk, bk in ((f"features.{idx}.weight", f"features.{idx}.bias"),
                       (f"{idx}.weight", f"{idx}.bias")):
            if wk in state:
                params[name] = {"kernel": _conv(state[wk]),
                                "bias": state[bk].copy()}
                break
    if len(params) != len(VGG16_CONV_IDX):
        raise ValueError("not a torchvision vgg16 state dict")
    return {"params": params}


def load_alexnet_state(state: Dict[str, np.ndarray]) -> Dict:
    params = {}
    for n, (idx, *_rest) in enumerate(_ALEXNET_SPECS, 1):
        for wk, bk in ((f"features.{idx}.weight", f"features.{idx}.bias"),
                       (f"{idx}.weight", f"{idx}.bias")):
            if wk in state:
                params[f"conv_{n}"] = {"kernel": _conv(state[wk]),
                                       "bias": state[bk].copy()}
                break
    if len(params) != len(_ALEXNET_SPECS):
        raise ValueError("not a torchvision alexnet state dict")
    return {"params": params}


def load_resnet50_state(state: Dict[str, np.ndarray]) -> Dict:
    params: Dict = {}
    stats: Dict = {}

    def put_conv(dst, src):
        params.setdefault(dst[0], {})
        node = params
        for k in dst[:-1]:
            node = node.setdefault(k, {})
        node[dst[-1]] = {"kernel": _conv(state[f"{src}.weight"])}

    def put_bn(dst, src):
        pnode, snode = params, stats
        for k in dst[:-1]:
            pnode = pnode.setdefault(k, {})
            snode = snode.setdefault(k, {})
        pnode[dst[-1]] = {"scale": state[f"{src}.weight"].copy(),
                          "bias": state[f"{src}.bias"].copy()}
        snode[dst[-1]] = {"mean": state[f"{src}.running_mean"].copy(),
                          "var": state[f"{src}.running_var"].copy()}

    put_conv(["conv1"], "conv1")
    put_bn(["bn1"], "bn1")
    for s, (_mid, blocks) in enumerate(_RESNET50_STAGES, 1):
        for b in range(blocks):
            src = f"layer{s}.{b}"
            dst = f"layer{s}_{b}"
            for c in ("conv1", "conv2", "conv3"):
                put_conv([dst, c], f"{src}.{c}")
            for bn in ("bn1", "bn2", "bn3"):
                put_bn([dst, bn], f"{src}.{bn}")
            if f"{src}.downsample.0.weight" in state:
                put_conv([dst, "down_conv"], f"{src}.downsample.0")
                put_bn([dst, "down_bn"], f"{src}.downsample.1")
    return {"params": params, "batch_stats": stats}


BACKBONES = {
    "vgg16": (VGG16Features, load_vgg16_state,
              ("relu_1_1", "relu_2_1", "relu_3_1", "relu_4_1",
               "relu_5_1")),
    "alexnet": (AlexNetFeatures, load_alexnet_state,
                ("relu_1", "relu_2", "relu_3", "relu_4", "relu_5")),
    "resnet50": (ResNet50Features, load_resnet50_state,
                 ("layer_1", "layer_2", "layer_3", "layer_4")),
}


def build_backbone(network: str, layers: Optional[Sequence[str]] = None,
                   weights_path: Optional[str] = None):
    """(model, variables, layers, pretrained?) for an alternate
    perceptual backbone.  ``weights_path``: a torchvision ``.pth``
    (read torch-free) or npz of the same key schema; random but
    deterministic init otherwise."""
    cls, loader, default_layers = BACKBONES[network]
    layers = tuple(layers or default_layers)
    model = cls(layers)
    if weights_path:
        if weights_path.endswith(".npz"):
            state = dict(np.load(weights_path))
        else:
            from renderloom.data.torch_import import (flatten_state_dict,
                                                      read_pth)
            state = flatten_state_dict(read_pth(weights_path))
        variables = loader(state)
        pretrained = True
    else:
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)))
        pretrained = False
    return model, variables, layers, pretrained
