"""VGG19 perceptual loss in flax.

Port of the semantics of ``PerceptualLoss``
(``Pose_Guided_Neural_Rendering/models/losses.py:158-277``): inputs in
[-1, 1] are renormalized to ImageNet statistics (losses.py:141-156), run
through VGG19, and compared with L1 at
``relu_1_1 … relu_5_1`` with weights ``[1/32, 1/16, 1/8, 1/4, 1]``
(configs/HSM.yaml:124-140).

torchvision is not available in this environment, so pretrained weights
load from an npz snapshot of the torchvision ``vgg19().features`` state
dict when present (``VGG19_NPZ`` env var or ``data/vgg19_features.npz``);
otherwise the extractor runs with fixed random (but deterministic)
weights — still a multi-scale random-projection feature loss, clearly
flagged at load time.  The npz → flax mapping lives in
:func:`load_torchvision_npz`.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# VGG19 conv plan: (block, convs-in-block, channels)
VGG19_PLAN = [(1, 2, 64), (2, 2, 128), (3, 4, 256), (4, 4, 512),
              (5, 4, 512)]
DEFAULT_LAYERS = ("relu_1_1", "relu_2_1", "relu_3_1", "relu_4_1",
                  "relu_5_1")
DEFAULT_WEIGHTS = (1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)

# torchvision vgg19().features Sequential indices of each conv
TORCHVISION_CONV_IDX = {
    "conv_1_1": 0, "conv_1_2": 2,
    "conv_2_1": 5, "conv_2_2": 7,
    "conv_3_1": 10, "conv_3_2": 12, "conv_3_3": 14, "conv_3_4": 16,
    "conv_4_1": 19, "conv_4_2": 21, "conv_4_3": 23, "conv_4_4": 25,
    "conv_5_1": 28, "conv_5_2": 30, "conv_5_3": 32, "conv_5_4": 34,
}


class VGG19Features(nn.Module):
    """VGG19 trunk emitting the requested relu taps.  NHWC input in
    ImageNet-normalized space; max-pool 2×2 between blocks.  ``dtype``
    sets the compute precision (bf16 on TPU — the ×10 perceptual term
    runs twice per G-step at full resolution and its fp32 activations
    dominate HBM traffic otherwise); params stay fp32."""

    layers: Sequence[str] = DEFAULT_LAYERS
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jax.Array]:
        taps = {}
        x = x.astype(self.dtype)
        wanted = set(self.layers)
        deepest = max(int(name.split("_")[1]) for name in wanted)
        for block, n_convs, ch in VGG19_PLAN:
            if block > deepest:
                break
            for i in range(1, n_convs + 1):
                x = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                            param_dtype=jnp.float32,
                            name=f"conv_{block}_{i}")(x)
                x = nn.relu(x)
                tap = f"relu_{block}_{i}"
                if tap in wanted:
                    taps[tap] = x
            if block < deepest:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


def load_torchvision_npz(path: str) -> Dict:
    """npz of a torchvision ``vgg19().features`` state dict → flax params
    (OIHW → HWIO kernels)."""
    raw = np.load(path)
    params = {}
    for name, idx in TORCHVISION_CONV_IDX.items():
        wkey, bkey = f"features.{idx}.weight", f"features.{idx}.bias"
        if wkey not in raw:
            continue
        params[name] = {
            "kernel": np.transpose(raw[wkey], (2, 3, 1, 0)),
            "bias": raw[bkey],
        }
    return {"params": params}


def load_torchvision_pth(path: str) -> Dict:
    """torchvision ``vgg19`` checkpoint (``.pth``, e.g. the official
    ``vgg19-dcbb9e9d.pth`` download) → flax params, torch-free
    (renderloom.data.torch_import).  Accepts either a full-model state
    dict (``features.N.*`` + ``classifier.*``) or a bare ``.features``
    one (``N.weight``)."""
    from renderloom.data.torch_import import flatten_state_dict, read_pth

    state = flatten_state_dict(read_pth(path))
    params = {}
    for name, idx in TORCHVISION_CONV_IDX.items():
        for wkey, bkey in ((f"features.{idx}.weight",
                            f"features.{idx}.bias"),
                           (f"{idx}.weight", f"{idx}.bias")):
            if wkey in state:
                params[name] = {
                    "kernel": np.transpose(state[wkey], (2, 3, 1, 0)),
                    "bias": state[bkey],
                }
                break
    if len(params) != len(TORCHVISION_CONV_IDX):
        raise ValueError(
            f"{path}: found {len(params)}/16 VGG19 conv layers — not a "
            "torchvision vgg19 state dict")
    return {"params": params}


def find_vgg_weights() -> Optional[str]:
    cands = [os.environ.get("VGG19_NPZ", ""),
             "data/vgg19_features.npz",
             os.path.join(os.path.dirname(__file__), "..", "..", "data",
                          "vgg19_features.npz")]
    for c in cands:
        if c and os.path.exists(c):
            return c
    return None


class PerceptualLoss:
    """Callable L1 perceptual criterion (losses.py:158-277, criterion
    'l1', num_scales 1)."""

    def __init__(self, layers: Sequence[str] = DEFAULT_LAYERS,
                 weights: Sequence[float] = DEFAULT_WEIGHTS,
                 weights_path: Optional[str] = None,
                 require_pretrained: bool = False,
                 network: str = "vgg19",
                 compute_dtype: str = "float32"):
        dtype = (jnp.bfloat16 if compute_dtype == "bfloat16"
                 else jnp.float32)
        if network != "vgg19":
            # alternate backbones from the reference's loss library
            # (losses.py:189-202): vgg16 / alexnet / resnet50, each with
            # its own default taps and uniform weights (the [1/32..1]
            # schedule is vgg19-specific, configs/HSM.yaml:124-140)
            from renderloom.models.backbones import build_backbone

            model, variables, taps, pretrained = build_backbone(
                network, None if layers is DEFAULT_LAYERS else layers,
                weights_path)
            self.model, self.variables = model, variables
            self.layers = tuple(taps)
            self.weights = (tuple(weights)
                            if weights is not DEFAULT_WEIGHTS
                            else (1.0,) * len(self.layers))
            self.pretrained = pretrained
            if not pretrained and require_pretrained:
                raise RuntimeError(
                    f"PerceptualLoss[{network}]: no pretrained weights "
                    "provided (pass a torchvision .pth/.npz as "
                    "weights_path)")
            return
        self.layers = tuple(layers)
        self.weights = tuple(weights)
        self.model = VGG19Features(self.layers, dtype)
        path = weights_path or find_vgg_weights()
        if path:
            self.variables = (load_torchvision_pth(path)
                              if path.endswith((".pth", ".pt"))
                              else load_torchvision_npz(path))
            self.pretrained = True
        elif require_pretrained:
            raise RuntimeError(
                "PerceptualLoss: no pretrained VGG19 weights found. The "
                "×10-weighted perceptual term would train against RANDOM "
                "features — not the reference objective "
                "(Pose_Guided_Neural_Rendering/models/losses.py:222-277). "
                "Provide weights via VGG19_NPZ=<path to vgg19_features.npz "
                "or torchvision vgg19 .pth>, or pass --allow-random-vgg "
                "to proceed anyway.")
        else:
            key = jax.random.PRNGKey(0)
            dummy = jnp.zeros((1, 64, 64, 3))
            self.variables = self.model.init(key, dummy)
            self.pretrained = False
            print("PerceptualLoss: no VGG19 weights found — using fixed "
                  "random features (set VGG19_NPZ for parity)")

    def renormalize(self, x: jax.Array) -> jax.Array:
        """[-1, 1] → ImageNet-normalized (losses.py:141-156)."""
        mean = jnp.asarray(IMAGENET_MEAN)
        std = jnp.asarray(IMAGENET_STD)
        return ((x + 1.0) / 2.0 - mean) / std

    def __call__(self, pred: jax.Array, target: jax.Array) -> jax.Array:
        f_pred = self.model.apply(self.variables, self.renormalize(pred))
        f_tgt = self.model.apply(self.variables,
                                 self.renormalize(target))
        loss = 0.0
        for name, w in zip(self.layers, self.weights):
            diff = jnp.abs(f_pred[name]
                           - jax.lax.stop_gradient(f_tgt[name]))
            # reduce in fp32 (bf16 mean over ~10M elements loses bits)
            loss = loss + w * jnp.mean(diff.astype(jnp.float32))
        return loss

    def lpips(self, pred: jax.Array, target: jax.Array) -> jax.Array:
        """LPIPS-style perceptual distance (Zhang et al. 2018): squared
        difference of channel-unit-normalized VGG features, averaged
        spatially, summed over layers.  Uniform (uncalibrated) linear
        weights — the learned 1×1 calibration isn't shipped with
        torchvision and can't be fetched here, so this is the standard
        "lpips-vgg (uncal.)" variant.  Returns one scalar per batch
        element; reported as LPIPS-delta-vs-reference in BASELINE.md."""
        f_pred = self.model.apply(self.variables, self.renormalize(pred))
        f_tgt = self.model.apply(self.variables, self.renormalize(target))
        dist = 0.0
        for name in self.layers:
            a = _unit_normalize(f_pred[name])
            b = _unit_normalize(f_tgt[name])
            # mean over H, W; sum over channels (LPIPS convention with
            # uniform weights scales as mean over C)
            dist = dist + jnp.mean((a - b) ** 2, axis=(1, 2, 3))
        return dist / len(self.layers)


def _unit_normalize(feat: jax.Array, eps: float = 1e-10) -> jax.Array:
    """Scale each pixel's channel vector to unit L2 norm (NHWC)."""
    norm = jnp.sqrt(jnp.sum(feat ** 2, axis=-1, keepdims=True))
    return feat / (norm + eps)
