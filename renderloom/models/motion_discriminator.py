"""Experimental motion discriminator (disabled by default, like the
reference: ``use_dis: False`` in
``Human_Motion_Modelling/configs/config.yaml:97``).

Port of ``Discriminator_2D``
(``Human_Motion_Modelling/models/discriminator.py:108-178``): the pose
matrix is treated as a 1×C×L image run through a conv stack with
max-pool downsampling, ending in a patch-GAN map or a global-pooled
logit.  NHWC here: input (B, 1, L, C) with C = channels[0].
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from renderloom.models.layers import leaky


class MotionDiscriminator(nn.Module):
    """Conv stack over a pose sequence "image"."""

    channels: Sequence[int] = (38, 64, 96, 128)
    use_patch_gan: bool = False
    use_sigmoid: bool = False

    @nn.compact
    def __call__(self, motion: jax.Array) -> jax.Array:
        """motion: (B, C, L) pose matrix → (B, ...) logits."""
        B, C, L = motion.shape
        # reference layout is NCHW (B, joints, 1, L); NHWC equivalent is
        # (B, H=1, W=L, features=joints)
        x = jnp.reshape(jnp.transpose(motion, (0, 2, 1)), (B, 1, L, C))
        ch = self.channels
        x = nn.Conv(ch[1], (3, 3), padding="SAME", name="conv_in")(x)
        x = leaky(x)
        for i in range(1, len(ch) - 1):
            x = nn.Conv(ch[i + 1], (3, 3), padding="SAME",
                        name=f"conv_{i}a")(x)
            x = leaky(x)
            x = nn.Conv(ch[i + 1], (3, 3), padding="SAME",
                        name=f"conv_{i}b")(x)
            x = leaky(x)
            x = nn.max_pool(x, (1, 3), strides=(1, 2),
                            padding=((0, 0), (1, 1)))
        if not self.use_patch_gan:
            x = jnp.mean(x, axis=(1, 2), keepdims=True)
        x = nn.Conv(1, (1, 1), use_bias=False, name="head")(x)
        if self.use_sigmoid:
            x = jax.nn.sigmoid(x)
        return x
