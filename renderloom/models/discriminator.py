"""Multi-scale patch discriminators with region heads.

Rebuild of ``Pose_Guided_Neural_Rendering/models/discriminator.py``:

* ``PatchDiscriminator`` — N stride-2 'CNA' conv layers then a 1-channel
  logit head, returning the logits and every intermediate activation for
  feature matching (discriminator.py:141-210);
* ``MultiPatchDiscriminator`` — the same net replicated over
  progressively 2×-bilinear-downsampled inputs (discriminator.py:215-274);
* ``DiscriminatorSet`` — the trainer-facing wrapper
  (discriminator.py:15-136): 'fuse' (label‖image, 25ch), 'raw'
  (foreground-masked generated human), 'face'/'hand' on heatmap-driven
  crops (``renderloom.ops.crops``).  Hand crops carry a validity weight
  instead of the reference's variable-length concat.

NHWC; spectral norm everywhere per configs/HSM.yaml:84.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from renderloom.core.config import DiscriminatorConfig, PatchDiscConfig
from renderloom.models.layers import ConvBlock, SNConv
from renderloom.ops.crops import face_crop, hand_crops


class PatchDiscriminator(nn.Module):
    """N-layer patch discriminator (discriminator.py:141-210)."""

    cfg: PatchDiscConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats: bool = False
                 ) -> Tuple[jax.Array, List[jax.Array]]:
        c = self.cfg
        spectral = c.weight_norm_type == "spectral"
        feats = []
        ch = c.num_filters
        h = ConvBlock(ch, kernel=c.kernel_size, stride=2,
                      spectral=spectral, norm=c.activation_norm_type,
                      dtype=self.dtype, name="layer0")(x, update_stats)
        feats.append(h)
        for n in range(c.num_layers):
            ch = min(ch * 2, c.max_num_filters)
            stride = 2 if n < c.num_layers - 1 else 1
            h = ConvBlock(ch, kernel=c.kernel_size, stride=stride,
                          spectral=spectral, norm=c.activation_norm_type,
                          dtype=self.dtype,
                          name=f"layer{n + 1}")(h, update_stats)
            feats.append(h)
        logits = SNConv(1, 3, 1, spectral, dtype=self.dtype,
                        name="head")(h, update_stats)
        return logits, feats


class MultiPatchDiscriminator(nn.Module):
    """Multi-resolution stack (discriminator.py:215-274)."""

    cfg: PatchDiscConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        outputs, features = [], []
        for i in range(self.cfg.num_discriminators):
            logits, feats = PatchDiscriminator(
                self.cfg, self.dtype, name=f"scale{i}")(x, update_stats)
            outputs.append(logits)
            features.append(feats)
            if i != self.cfg.num_discriminators - 1:
                B, H, W, C = x.shape
                x = jax.image.resize(x, (B, H // 2, W // 2, C),
                                     method="bilinear")
        return {"output": outputs, "features": features}


class DiscriminatorSet(nn.Module):
    """Full D stack: fuse + raw + face + hand (discriminator.py:15-136).

    ``__call__(label, real, fake, raw, fg_mask)`` returns
    ``{key: {pred_real, pred_fake, weight?}}`` where each pred is a
    MultiPatch output dict.  ``raw`` is the un-composited generated image;
    fg_mask (B,H,W,1) gates the raw pass.
    """

    cfg: DiscriminatorConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.net_d = MultiPatchDiscriminator(self.cfg.image, self.dtype)
        if self.cfg.use_face:
            self.net_d_face = MultiPatchDiscriminator(self.cfg.face,
                                                      self.dtype)
        if self.cfg.use_hand:
            self.net_d_hand = MultiPatchDiscriminator(self.cfg.hand,
                                                      self.dtype)

    def __call__(self, label, real, fake, raw, fg_mask,
                 update_stats: bool = False) -> Dict:
        out = {}
        lbl_real = jnp.concatenate([label, real], axis=-1)
        lbl_fake = jnp.concatenate([label, fake], axis=-1)
        out["fuse"] = {
            "pred_real": self.net_d(lbl_real, update_stats),
            "pred_fake": self.net_d(lbl_fake, update_stats),
        }
        lbl_real_m = jnp.concatenate([label, real * fg_mask], axis=-1)
        lbl_raw_m = jnp.concatenate([label, raw * fg_mask], axis=-1)
        out["raw"] = {
            "pred_real": self.net_d(lbl_real_m, update_stats),
            "pred_fake": self.net_d(lbl_raw_m, update_stats),
        }
        if self.cfg.use_face:
            real_f = face_crop(real, label)
            raw_f = face_crop(raw, label)
            out["face"] = {
                "pred_real": self.net_d_face(real_f, update_stats),
                "pred_fake": self.net_d_face(raw_f, update_stats),
            }
        if self.cfg.use_hand:
            real_h, valid = hand_crops(real, label)     # (B,2,S,S,3)
            raw_h, _ = hand_crops(raw, label)
            B = real_h.shape[0]
            flat = lambda t: t.reshape((B * 2,) + t.shape[2:])
            out["hand"] = {
                "pred_real": self.net_d_hand(flat(real_h), update_stats),
                "pred_fake": self.net_d_hand(flat(raw_h), update_stats),
                "weight": flat(valid[..., None]).astype(jnp.float32),
            }
        return out
