"""Alternate perceptual-loss backbones (reference loss-library parity).

The reference's ``PerceptualLoss`` can run on seven backbones besides
nothing else: vgg19 (default) / vgg16 / alexnet / inception_v3 /
resnet50 / robust_resnet50 / vgg_face_dag
(``Pose_Guided_Neural_Rendering/models/losses.py:189-202``, zoo at
``:331-495``).  These are flax NHWC re-implementations with the same
tap names as the reference's ``layer_name_mapping`` tables, loading
torchvision-schema checkpoints through the torch-free reader
(``renderloom.data.torch_import``).

Pretrained weights for ``inception_v3`` / ``robust_resnet50`` /
``vgg_face_dag`` are unreachable in this environment (no egress;
robust/vgg_face also live on non-torchvision URLs — losses.py:417,440),
so those three initialize deterministically random unless the user
supplies a ``.pth``/npz via ``weights_path`` — the architectures and
tap tables are carried for full zoo parity.
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
# inception_v3 (losses.py:364-391): the reference chains the
# torchvision Inception3 submodules in an nn.Sequential, tapping the
# two stem maxpools, Mixed_6e, and the final adaptive avg-pool
# ------------------------------------------------------------------


class _BasicConv(nn.Module):
    """torchvision BasicConv2d: conv(no bias) + BN(eps 1e-3) + relu."""

    features: int
    kernel: tuple
    stride: int = 1
    padding: tuple = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel,
                    strides=(self.stride, self.stride),
                    padding=self.padding, use_bias=False,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         name="bn")(x)
        return nn.relu(x)


def _same(k):
    return tuple((d // 2, d // 2) for d in k)


def _maxpool3s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


def _avgpool3s1p1(x):
    return nn.avg_pool(x, (3, 3), strides=(1, 1),
                       padding=((1, 1), (1, 1)),
                       count_include_pad=False)


class _InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = _BasicConv(64, (1, 1), name="branch1x1")(x)
        b5 = _BasicConv(48, (1, 1), name="branch5x5_1")(x)
        b5 = _BasicConv(64, (5, 5), padding=_same((5, 5)),
                        name="branch5x5_2")(b5)
        b3 = _BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = _BasicConv(96, (3, 3), padding=_same((3, 3)),
                        name="branch3x3dbl_2")(b3)
        b3 = _BasicConv(96, (3, 3), padding=_same((3, 3)),
                        name="branch3x3dbl_3")(b3)
        bp = _BasicConv(self.pool_features, (1, 1),
                        name="branch_pool")(_avgpool3s1p1(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class _InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = _BasicConv(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = _BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = _BasicConv(96, (3, 3), padding=_same((3, 3)),
                        name="branch3x3dbl_2")(bd)
        bd = _BasicConv(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _maxpool3s2(x)], axis=-1)


class _InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        p17 = ((0, 0), (3, 3))
        p71 = ((3, 3), (0, 0))
        b1 = _BasicConv(192, (1, 1), name="branch1x1")(x)
        b7 = _BasicConv(self.c7, (1, 1), name="branch7x7_1")(x)
        b7 = _BasicConv(self.c7, (1, 7), padding=p17,
                        name="branch7x7_2")(b7)
        b7 = _BasicConv(192, (7, 1), padding=p71, name="branch7x7_3")(b7)
        bd = _BasicConv(self.c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = _BasicConv(self.c7, (7, 1), padding=p71,
                        name="branch7x7dbl_2")(bd)
        bd = _BasicConv(self.c7, (1, 7), padding=p17,
                        name="branch7x7dbl_3")(bd)
        bd = _BasicConv(self.c7, (7, 1), padding=p71,
                        name="branch7x7dbl_4")(bd)
        bd = _BasicConv(192, (1, 7), padding=p17,
                        name="branch7x7dbl_5")(bd)
        bp = _BasicConv(192, (1, 1),
                        name="branch_pool")(_avgpool3s1p1(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class _InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = _BasicConv(192, (1, 1), name="branch3x3_1")(x)
        b3 = _BasicConv(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = _BasicConv(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = _BasicConv(192, (1, 7), padding=((0, 0), (3, 3)),
                        name="branch7x7x3_2")(b7)
        b7 = _BasicConv(192, (7, 1), padding=((3, 3), (0, 0)),
                        name="branch7x7x3_3")(b7)
        b7 = _BasicConv(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _maxpool3s2(x)], axis=-1)


class _InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = _BasicConv(320, (1, 1), name="branch1x1")(x)
        b3 = _BasicConv(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            _BasicConv(384, (1, 3), padding=((0, 0), (1, 1)),
                       name="branch3x3_2a")(b3),
            _BasicConv(384, (3, 1), padding=((1, 1), (0, 0)),
                       name="branch3x3_2b")(b3)], axis=-1)
        bd = _BasicConv(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = _BasicConv(384, (3, 3), padding=_same((3, 3)),
                        name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            _BasicConv(384, (1, 3), padding=((0, 0), (1, 1)),
                       name="branch3x3dbl_3a")(bd),
            _BasicConv(384, (3, 1), padding=((1, 1), (0, 0)),
                       name="branch3x3dbl_3b")(bd)], axis=-1)
        bp = _BasicConv(192, (1, 1),
                        name="branch_pool")(_avgpool3s1p1(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


_INCEPTION_C7 = {"Mixed_6b": 128, "Mixed_6c": 160, "Mixed_6d": 160,
                 "Mixed_6e": 192}


class InceptionV3Features(nn.Module):
    """Inception-v3 trunk with the reference's taps
    ``pool_1 / pool_2 / mixed_6e / pool_3`` (losses.py:386-390).
    Input is NHWC in ImageNet-normalized space (the Sequential in the
    reference bypasses Inception3's transform_input step)."""

    layers: Sequence[str] = ("pool_3",)

    @nn.compact
    def __call__(self, x) -> Dict[str, jax.Array]:
        taps = {}
        wanted = set(self.layers)
        order = ["pool_1", "pool_2", "mixed_6e", "pool_3"]
        deepest = max(order.index(n) for n in wanted)

        x = _BasicConv(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = _BasicConv(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = _BasicConv(64, (3, 3), padding=_same((3, 3)),
                       name="Conv2d_2b_3x3")(x)
        x = _maxpool3s2(x)
        if "pool_1" in wanted:
            taps["pool_1"] = x
        if deepest == 0:
            return taps
        x = _BasicConv(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = _BasicConv(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _maxpool3s2(x)
        if "pool_2" in wanted:
            taps["pool_2"] = x
        if deepest == 1:
            return taps
        x = _InceptionA(32, name="Mixed_5b")(x)
        x = _InceptionA(64, name="Mixed_5c")(x)
        x = _InceptionA(64, name="Mixed_5d")(x)
        x = _InceptionB(name="Mixed_6a")(x)
        for blk in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
            x = _InceptionC(_INCEPTION_C7[blk], name=blk)(x)
        if "mixed_6e" in wanted:
            taps["mixed_6e"] = x
        if deepest == 2:
            return taps
        x = _InceptionD(name="Mixed_7a")(x)
        x = _InceptionE(name="Mixed_7b")(x)
        x = _InceptionE(name="Mixed_7c")(x)
        taps["pool_3"] = jnp.mean(x, axis=(1, 2), keepdims=True)
        return taps


# ------------------------------------------------------------------
# vgg_face_dag (losses.py:440-495): vgg16 trunk with Oxford VGG-Face
# weights, tapping avgpool and the classifier fc/relu stages
# ------------------------------------------------------------------


def _adaptive_avg_pool(x, out_h: int, out_w: int):
    """torch AdaptiveAvgPool2d: window [floor(i·n/o), ceil((i+1)·n/o))."""
    B, H, W, C = x.shape
    if H == out_h and W == out_w:
        return x
    rows = []
    for i in range(out_h):
        h0, h1 = (i * H) // out_h, -(-((i + 1) * H) // out_h)
        cols = []
        for j in range(out_w):
            w0, w1 = (j * W) // out_w, -(-((j + 1) * W) // out_w)
            cols.append(jnp.mean(x[:, h0:h1, w0:w1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)


class VGGFaceFeatures(nn.Module):
    """VGG-Face: vgg16 conv trunk → adaptive 7×7 avg-pool → fc6/fc7/fc8
    with the reference's taps ``avgpool / fc6 / relu_6 / fc7 / relu_7 /
    fc8`` (losses.py:487-492).  The flatten before fc6 is NCHW-ordered
    to match the torch weights."""

    layers: Sequence[str] = ("fc8",)

    @nn.compact
    def __call__(self, x) -> Dict[str, jax.Array]:
        taps = {}
        wanted = set(self.layers)
        for block, n_convs, ch in VGG16_PLAN:
            for i in range(1, n_convs + 1):
                x = nn.Conv(ch, (3, 3), padding="SAME",
                            name=f"conv_{block}_{i}")(x)
                x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = _adaptive_avg_pool(x, 7, 7)
        if "avgpool" in wanted:
            taps["avgpool"] = x
        # torch flattens NCHW: channel-major ordering
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        for name, feats in (("fc6", 4096), ("fc7", 4096), ("fc8", 2622)):
            x = nn.Dense(feats, name=name)(x)
            if name in wanted:
                taps[name] = x
            if name != "fc8":
                x = nn.relu(x)
                if f"relu_{name[-1]}" in wanted:
                    taps[f"relu_{name[-1]}"] = x
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


def load_inception_state(state: Dict[str, np.ndarray]) -> Dict:
    """torchvision ``inception_v3`` state dict (``<block>.conv.weight``,
    ``<block>.bn.{weight,bias,running_mean,running_var}`` with dotted
    branch paths inside Mixed blocks) → flax variables."""
    params: Dict = {}
    stats: Dict = {}

    def node(tree, path):
        for k in path:
            tree = tree.setdefault(k, {})
        return tree

    n_convs = 0
    for k, v in state.items():
        parts = k.split(".")
        if len(parts) < 3 or parts[0].startswith(("fc", "AuxLogits")):
            continue
        *path, mod, leaf = parts
        if mod == "conv" and leaf == "weight":
            node(params, path)["conv"] = {"kernel": _conv(v)}
            n_convs += 1
        elif mod == "bn":
            if leaf in ("weight", "bias"):
                node(params, path).setdefault("bn", {})[
                    "scale" if leaf == "weight" else "bias"] = v.copy()
            elif leaf in ("running_mean", "running_var"):
                node(stats, path).setdefault("bn", {})[
                    "mean" if leaf == "running_mean" else "var"] = v.copy()
    if n_convs < 94:   # inception_v3 has 94 convs outside AuxLogits/fc
        raise ValueError(
            f"not a torchvision inception_v3 state dict ({n_convs} convs)")
    return {"params": params, "batch_stats": stats}


def load_robust_resnet50_state(state: Dict[str, np.ndarray]) -> Dict:
    """robust-resnet50 checkpoints (Madry ImageNet.pt: a ``model``
    envelope with ``module.model.``-prefixed resnet50 keys,
    losses.py:417-424) → flax variables; plain resnet50 dicts also
    load."""
    stripped = {}
    for k, v in state.items():
        for pre in ("module.model.", "module.attacker.model.", "model."):
            if k.startswith(pre):
                k = k[len(pre):]
                break
        stripped.setdefault(k, v)
    return load_resnet50_state(stripped)


_VGGFACE_RAW_CONV = {   # Oxford naming -> flax tap-style names
    f"conv{b}_{i}": f"conv_{b}_{i}"
    for b, n, _ch in VGG16_PLAN for i in range(1, n + 1)
}


def load_vgg_face_state(state: Dict[str, np.ndarray]) -> Dict:
    """VGG-Face weights → flax: accepts the original Oxford naming
    (``conv1_1.weight`` … ``fc8.weight``) or the torchvision-remapped
    schema the reference constructs (``features.N.*`` +
    ``classifier.{0,3,6}.*``, losses.py:446-478)."""
    params: Dict = {}
    for raw, mine in _VGGFACE_RAW_CONV.items():
        idx = VGG16_CONV_IDX[mine]
        for wk, bk in ((f"{raw}.weight", f"{raw}.bias"),
                       (f"features.{idx}.weight", f"features.{idx}.bias")):
            if wk in state:
                params[mine] = {"kernel": _conv(state[wk]),
                                "bias": state[bk].copy()}
                break
    cls_idx = {"fc6": 0, "fc7": 3, "fc8": 6}
    for fc, idx in cls_idx.items():
        for wk, bk in ((f"{fc}.weight", f"{fc}.bias"),
                       (f"classifier.{idx}.weight",
                        f"classifier.{idx}.bias")):
            if wk in state:
                w = state[wk]
                if w.ndim == 4:   # Oxford ships fc6 as a 7x7 conv
                    w = w.reshape(w.shape[0], -1)
                # flax kernel (in, out); the module flattens NCHW-ordered
                # so torch's column ordering is used as-is
                params[fc] = {"kernel": np.ascontiguousarray(w.T),
                              "bias": state[bk].copy()}
                break
    if len(params) != len(_VGGFACE_RAW_CONV) + 3:
        raise ValueError(
            f"not a VGG-Face state dict ({len(params)} layers mapped)")
    return {"params": params}


BACKBONES = {
    "vgg16": (VGG16Features, load_vgg16_state,
              ("relu_1_1", "relu_2_1", "relu_3_1", "relu_4_1",
               "relu_5_1")),
    "alexnet": (AlexNetFeatures, load_alexnet_state,
                ("relu_1", "relu_2", "relu_3", "relu_4", "relu_5")),
    "resnet50": (ResNet50Features, load_resnet50_state,
                 ("layer_1", "layer_2", "layer_3", "layer_4")),
    "inception_v3": (InceptionV3Features, load_inception_state,
                     ("pool_1", "pool_2", "mixed_6e", "pool_3")),
    "robust_resnet50": (ResNet50Features, load_robust_resnet50_state,
                        ("layer_1", "layer_2", "layer_3", "layer_4")),
    "vgg_face_dag": (VGGFaceFeatures, load_vgg_face_state,
                     ("avgpool", "fc6", "relu_6", "fc7", "relu_7",
                      "fc8")),
}


def build_backbone(network: str, layers: Optional[Sequence[str]] = None,
                   weights_path: Optional[str] = None):
    """(model, variables, layers, pretrained?) for an alternate
    perceptual backbone.  ``weights_path``: a torchvision-schema ``.pth``
    (read torch-free; ``model``-envelope robust checkpoints unwrap) or
    npz of the same keys; random but deterministic init otherwise."""
    cls, loader, default_layers = BACKBONES[network]
    layers = tuple(layers or default_layers)
    model = cls(layers)
    if weights_path:
        if weights_path.endswith(".npz"):
            state = dict(np.load(weights_path))
        else:
            from renderloom.data.torch_import import (flatten_state_dict,
                                                      read_pth)
            obj = read_pth(weights_path)
            if isinstance(obj, dict) and isinstance(obj.get("model"),
                                                    dict):
                obj = obj["model"]   # robust ImageNet.pt envelope
            state = flatten_state_dict(obj)
        variables = loader(state)
        pretrained = True
    else:
        # vgg_face's fc6 needs the 224-input 7x7 post-pool grid
        h = 224 if cls is VGGFaceFeatures else 64
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, h, h, 3)))
        pretrained = False
    return model, variables, layers, pretrained
