"""Pose-conditioned SPADE generator with blend-mask head.

Rebuild of the reference's vid2vid-style generator
(``Pose_Guided_Neural_Rendering/models/generator.py:35-510``) as flax
modules in NHWC:

* ``LabelEmbedder`` — encoder pyramid over ``concat(img_warped, img_prev)``
  (6ch): first conv + ``num_downsamples`` stride-2 convs, each level's
  features feeding the SPADE norms at the matching scale
  (generator.py:306-410, arch 'encoder' per configs/HSM.yaml:60-67);
* ``Generator`` — down_first conv → (num_downsamples_img+1) SPADE
  down-res blocks with 3×3/s2 avg-pools between → num_res_blocks
  bottleneck SPADE res blocks → SPADE up-res blocks with nearest ×2 —
  → leaky→conv→tanh image head (generator.py:104-129,181-234);
* ``MaskGenerator`` — dual encoder (label 22ch | images 9ch), channel
  concat at the bottleneck, 4 'CNACN' res blocks, conv-decoder, sigmoid
  1ch blend mask (generator.py:415-510, configs/HSM.yaml:51-59).

Shapes: inputs (B, H, W, C); H, W divisible by 16 (4 pools).  All convs
spectral-normalized (power-iteration state in ``batch_stats``, threaded
via ``update_stats``).  Res blocks optionally rematerialized
(``jax.checkpoint``) to trade FLOPs for HBM during training.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from renderloom.core.config import GeneratorConfig
from renderloom.models.layers import (ConvBlock, ResBlockCNACN, SNConv,
                                      SpadeResBlock, avg_pool_3x3s2,
                                      leaky, upsample2x)


def _filters(base: int, cap: int, level: int) -> int:
    return min(cap, base * (2 ** level))


class LabelEmbedder(nn.Module):
    """Encoder feature pyramid (generator.py:306-410, 'encoder' arch).

    Returns ``num_downsamples + 1`` maps: level 0 at input resolution with
    ``num_filters`` channels, level i at 1/2^i with
    ``min(max_filters, num_filters·2^i)``.
    """

    cfg: GeneratorConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats: bool = False) -> List[jax.Array]:
        e = self.cfg.embed
        spectral = e.weight_norm_type == "spectral"
        # conv_first: no norm (generator.py:340-341), leaky activation
        h = SNConv(e.num_filters, e.kernel_size, 1, spectral,
                   dtype=self.dtype, name="conv_first")(x, update_stats)
        h = leaky(h)
        levels = [h]
        for i in range(e.num_downsamples):
            ch = _filters(e.num_filters, e.max_num_filters, i + 1)
            h = SNConv(ch, e.kernel_size, 2, spectral, dtype=self.dtype,
                       name=f"down_{i}")(h, update_stats)
            h = leaky(h)
            levels.append(h)
        return levels


class MaskGenerator(nn.Module):
    """Soft blend-mask net (generator.py:415-510).

    ``label`` (B,H,W,22) and ``imgs`` = concat(img_prev, img_warped,
    img_gen) (B,H,W,9) are encoded separately, concatenated at 1/2^d
    resolution, refined by 'CNACN' res blocks, decoded, and squashed to a
    1-channel sigmoid mask.
    """

    cfg: GeneratorConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, label, imgs, update_stats: bool = False):
        m = self.cfg.mask
        spectral = m.weight_norm_type == "spectral"
        kw = dict(kernel=m.kernel_size, spectral=spectral,
                  dtype=self.dtype)

        def encoder(x, prefix):
            h = ConvBlock(m.num_filters, stride=1, name=f"{prefix}_in",
                          **kw)(x, update_stats)
            for i in range(m.num_downsamples):
                ch = _filters(m.num_filters, m.max_num_filters, i + 1)
                h = ConvBlock(ch, stride=2, name=f"{prefix}_down{i}",
                              **kw)(h, update_stats)
            return h

        h = jnp.concatenate([encoder(label, "lbl"), encoder(imgs, "img")],
                            axis=-1)
        ch = _filters(m.num_filters, m.max_num_filters, m.num_downsamples)
        for i in range(m.num_res_blocks):
            h = ResBlockCNACN(ch, m.kernel_size, spectral,
                              dtype=self.dtype,
                              name=f"res{i}")(h, update_stats)
        for i in reversed(range(m.num_downsamples)):
            h = upsample2x(h)
            ch_i = _filters(m.num_filters, m.max_num_filters, i)
            h = ConvBlock(ch_i, stride=1, name=f"up{i}",
                          **kw)(h, update_stats)
        mask = ConvBlock(1, kernel=m.kernel_size, stride=1,
                         spectral=False, norm="none",
                         activation="sigmoid", dtype=self.dtype,
                         name="conv_mask")(h, update_stats)
        return mask


class Generator(nn.Module):
    """SPADE generator (generator.py:35-250).

    forward(label, label_prev, img_warped, img_prev) → (img, mask):
    ``label`` is the target frame's 22ch pose raster; conditioning comes
    from ``concat(img_warped, img_prev)`` through the LabelEmbedder
    pyramid (generator.py:197); ``label_prev`` is accepted for interface
    parity but — as in the reference forward — unused.
    """

    cfg: GeneratorConfig
    dtype: jnp.dtype = jnp.float32
    # inference fast path computes the mask outside flax
    # (renderloom/models/fastpath.py); the param tree is unchanged
    with_mask: bool = True

    def filters(self, level: int) -> int:
        return _filters(self.cfg.num_filters, self.cfg.max_num_filters,
                        level)

    @nn.compact
    def __call__(self, label, label_prev, img_warped, img_prev,
                 update_stats: bool = False, cond_maps=None
                 ) -> Tuple[jax.Array, jax.Array]:
        g = self.cfg
        spectral = g.weight_norm_type == "spectral"
        n_down = g.num_downsamples
        n_res = int(-(-(g.num_layers - n_down) // 2) * 2)  # ceil to even
        n_embed = g.embed.num_downsamples

        if cond_maps is None:       # inference fast path precomputes
            cond_maps = LabelEmbedder(g, self.dtype, name="ref_embed")(
                jnp.concatenate([img_warped, img_prev], axis=-1),
                update_stats)

        block = lambda ch, name: SpadeResBlock(
            ch, g.kernel_size, g.spade_kernel_size, spectral,
            remat=g.do_checkpoint, dtype=self.dtype, name=name)

        # plain first conv (generator.py:146-149)
        x = nn.Conv(g.num_filters, (g.kernel_size, g.kernel_size),
                    padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name="down_first")(
                        label.astype(self.dtype))

        # SPADE down path with avg-pools (generator.py:201-208)
        for i in range(n_down + 1):
            j = min(n_embed, i)
            x = block(self.filters(i + 1), f"down_{i}")(
                x, cond_maps[j], update_stats)
            if i != n_down:
                x = avg_pool_3x3s2(x)

        # bottleneck res blocks (generator.py:211-215)
        j = min(n_embed, n_down + 1)
        for i in range(n_res):
            x = block(self.filters(n_down + 1), f"res_{i}")(
                x, cond_maps[j], update_stats)

        # SPADE up path (generator.py:220-224,236-250)
        for i in range(n_down, -1, -1):
            j = min(n_embed, i)
            x = block(self.filters(i), f"up_{i}")(
                x, cond_maps[j], update_stats)
            if i != 0:
                x = upsample2x(x)

        # image head: leaky → conv → tanh (generator.py:114-116,228)
        img = SNConv(g.input_image_nc, g.kernel_size, 1, spectral=False,
                     dtype=self.dtype, name="conv_img")(leaky(x))
        img = jnp.tanh(img)

        if not self.with_mask:
            return img, None

        mask = MaskGenerator(g, self.dtype, name="mask_net")(
            label.astype(self.dtype),
            jnp.concatenate([img_prev, img_warped, img],
                            axis=-1).astype(self.dtype),
            update_stats)
        # outputs stay in compute dtype: under bf16 the train scan
        # carries/streams them at half the bytes (the step is HBM-bound;
        # VERDICT r2 #1), and inference composites promote to fp32 via
        # the fp32 background
        return img, mask.astype(img.dtype)


def composite(img_gen: jax.Array, mask: jax.Array,
              img_back: jax.Array) -> jax.Array:
    """fuse = gen·mask + background·(1−mask)
    (Pose_Guided_Neural_Rendering/models/trainer.py:181-184)."""
    return img_gen * mask + img_back * (1.0 - mask)
