"""2D pose estimation head: frames → 19-joint keypoints.

The reference pipeline requires the external AlphaPose repo for pose
extraction (``HumanSloMo_Dataset/scripts/gen_run_alphapose.py``;
SURVEY.md §2.4 leaves retraining out of scope but allows "a JAX
pose-estimation head later").  renderloom ships that head: a compact
encoder-decoder predicting per-joint heatmaps at 1/4 resolution, trained
on the (image, pose) pairs already inside ``HumanSlomo.h5``
(``renderloom.train.pose``), decoded with a soft-argmax to sub-pixel
keypoints in the openpose 19-joint layout — so the full pipeline can run
with zero external model dependencies.  AlphaPose JSON ingestion remains
supported (``renderloom.data.openpose``); this head is the in-framework
alternative, not a replacement of the contract.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

N_JOINTS = 19
STRIDE = 4          # heatmap resolution = image / STRIDE


def _leaky(x):
    return nn.leaky_relu(x, 0.1)


class _ResBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3, 3), padding="SAME",
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        h = _leaky(h)
        h = nn.Conv(self.features, (3, 3), padding="SAME",
                    dtype=self.dtype, param_dtype=jnp.float32)(h)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32)(x)
        return _leaky(x + h)


class PoseNet(nn.Module):
    """(B, H, W, 3) in [0, 1] → heatmap logits (B, H/4, W/4, 19)."""

    base: int = 32
    blocks: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img: jax.Array) -> jax.Array:
        x = img.astype(self.dtype)
        x = nn.Conv(self.base, (7, 7), strides=(2, 2), padding="SAME",
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = _leaky(x)
        x = nn.Conv(self.base * 2, (3, 3), strides=(2, 2), padding="SAME",
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = _leaky(x)
        for _ in range(self.blocks):
            x = _ResBlock(self.base * 2, self.dtype)(x)
        logits = nn.Conv(N_JOINTS, (1, 1), dtype=self.dtype,
                         param_dtype=jnp.float32,
                         kernel_init=nn.initializers.zeros)(x)
        return logits.astype(jnp.float32)


def decode_heatmaps(logits: jax.Array, beta: float = 25.0
                    ) -> Tuple[jax.Array, jax.Array]:
    """Soft-argmax decode: (B, h, w, J) logits → keypoints (B, J, 2) in
    IMAGE pixels (x, y) and confidences (B, J) in [0, 1].

    Differentiable, static-shaped (no data-dependent argmax), one
    softmax + two weighted reductions — XLA-friendly."""
    B, h, w, J = logits.shape
    flat = logits.reshape(B, h * w, J)
    attn = jax.nn.softmax(beta * flat, axis=1).reshape(B, h, w, J)
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :, None]
    y = jnp.sum(attn * ys, axis=(1, 2))
    x = jnp.sum(attn * xs, axis=(1, 2))
    # + 0.5: heatmap cell centers → pixel coordinates at full resolution
    kps = jnp.stack([(x + 0.5) * STRIDE, (y + 0.5) * STRIDE], axis=-1)
    conf = jax.nn.sigmoid(jnp.max(flat, axis=1))
    return kps, conf
