"""Learned bidirectional flow for frame interpolation.

The reference delegates background interpolation to the external CUDA
DAIN repo (``HumanSloMo_Dataset/scripts/DAIN_{train,test}.py``).
renderloom ships two in-framework backends behind one interface
("keyframe pair + t → frame", SURVEY.md §7.6):

* ``renderloom.ops.flow`` — classical pyramidal Lucas-Kanade (no
  training required);
* this module — a compact UNet that predicts both flow directions in
  one forward pass, trained on HumanSloMo triplets with middle-frame
  supervision + photometric/smoothness objectives
  (``renderloom.train.flow``), Super-SloMo-style time warping.

All convs NHWC, optional bfloat16 compute with fp32 params.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from renderloom.ops.flow import backward_warp, backward_warp_shift


def _leaky(x):
    return nn.leaky_relu(x, 0.1)


class FlowUNet(nn.Module):
    """cat(img0, img1) (B,H,W,6) → (flow0→1, flow1→0), each (B,H,W,2).

    Encoder: stride-2 convs ×``levels`` (MXU-friendly 3×3, channels
    ``base·2^l`` capped at 8·base); decoder: ×2 nearest upsample + conv
    with skip concatenation.  The flow head is zero-initialized so the
    untrained network predicts zero flow (interpolation degrades to an
    average blend, never garbage).  H and W must be divisible by
    ``2**levels``.
    """

    base: int = 24
    levels: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img0: jax.Array, img1: jax.Array
                 ) -> Tuple[jax.Array, jax.Array]:
        x = jnp.concatenate([img0, img1], axis=-1).astype(self.dtype)
        skips = []
        ch = self.base
        for lvl in range(self.levels):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME",
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"down{lvl}")(x)
            x = _leaky(x)
            x = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"down{lvl}b")(x)
            x = _leaky(x)
            skips.append(x)
            ch = min(ch * 2, self.base * 8)

        for lvl in reversed(range(self.levels)):
            B, H, W, _ = x.shape
            x = jax.image.resize(x, (B, 2 * H, 2 * W, x.shape[-1]),
                                 method="nearest")
            if lvl > 0:
                x = jnp.concatenate([x, skips[lvl - 1]], axis=-1)
            x = nn.Conv(skips[lvl].shape[-1], (3, 3), padding="SAME",
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"up{lvl}")(x)
            x = _leaky(x)

        flows = nn.Conv(4, (3, 3), padding="SAME",
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name="flow_head")(x)
        flows = flows.astype(jnp.float32)
        return flows[..., :2], flows[..., 2:]


def time_warp(img0: jax.Array, img1: jax.Array, f01: jax.Array,
              f10: jax.Array, t: jax.Array, max_disp: int = 16,
              exact: bool = False) -> jax.Array:
    """Super-SloMo intermediate-time warp: approximate the flows from
    the unknown frame at ``t`` to each keyframe as linear combinations
    of the keyframe-to-keyframe flows, backward-warp both keyframes,
    and blend by time weight × photometric agreement (same blending rule
    as the LK backend, ``ops/flow.py:interpolate_pair``).

    ``max_disp`` bounds the per-axis displacement of the fast separable
    warp (cost linear in it) — content moving more than that between
    keyframes needs a larger bound (plumbed from ``FlowConfig.max_disp``
    at the pipeline call sites).  ``exact=True`` uses the unbounded
    bilinear gather warp instead — the training loss uses it so the
    photometric gradient is never zero-clipped past the bound (the
    reference's DAIN stage warps via unbounded grid_sample)."""
    f_t0 = -(1.0 - t) * t * f01 + t * t * f10
    f_t1 = (1.0 - t) * (1.0 - t) * f01 - t * (1.0 - t) * f10
    if exact:
        warp = backward_warp
    else:
        # learned flows come from a coarse decoder and are smooth, so
        # the gather-free separable warp applies (~9× faster on TPU;
        # quality re-validated by scripts/flow_quality_tpu.py)
        warp = lambda im, f: backward_warp_shift(im, f, max_disp)
    w0 = warp(img0, f_t0)
    w1 = warp(img1, f_t1)
    c1 = warp(img1, f01)                 # img1 pulled onto img0's grid
    c0 = warp(img0, f10)
    e0 = jnp.mean(jnp.abs(c1 - img0), axis=-1, keepdims=True)
    e1 = jnp.mean(jnp.abs(c0 - img1), axis=-1, keepdims=True)
    a0 = (1.0 - t) / (1.0 + e0)
    a1 = t / (1.0 + e1)
    return (a0 * w0 + a1 * w1) / (a0 + a1)


def make_learned_interp(model: FlowUNet, params, max_disp: int = 16):
    """Bind (model, params) into the ``interp_fn(img0, img1, t)``
    contract used by ``ops.flow.frame_double_pairs`` /
    ``upsample_background`` — a learned drop-in for the LK backend.
    ``max_disp`` bounds the fast warp's per-axis displacement (set from
    ``FlowConfig.max_disp`` for content moving >16 px between keys)."""

    def interp_fn(img0: jax.Array, img1: jax.Array, t) -> jax.Array:
        f01, f10 = model.apply({"params": params}, img0[None], img1[None])
        return time_warp(img0, img1, f01[0], f10[0],
                         jnp.asarray(t, jnp.float32), max_disp=max_disp)

    return interp_fn
