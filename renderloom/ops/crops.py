"""Face / hand region crops driven by pose heatmaps — static shapes.

The reference crops data-dependent regions with python ints and resizes
(``Pose_Guided_Neural_Rendering/utils/utils.py:162-294``), which cannot
trace under jit.  renderloom keeps the semantics but maps them to static
shapes:

* face: bbox of the nose heatmap (label channel 3 = joint 0,
  ``get_face_bbox_for_output``), square side ``2.5×`` the bbox width
  clamped to [32, W]; the dynamic-size crop + bilinear resize to the
  static ``H//32*8`` square becomes one
  ``jax.image.scale_and_translate`` with dynamic scale/translation and a
  static output shape;
* hands: static ``H//64*8`` squares dynamically-sliced around each hand
  heatmap's bbox center (channels -2/-1 = joints 17/18,
  ``get_hand_bbox_for_output``); missing hands yield a zero validity
  weight instead of the reference's variable-length batch.

Heatmap support: the reference's scipy gaussians are truncated at 4σ;
the closed-form rasters are thresholded at ``exp(-8)`` to match.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

HEAT_THRES = 3.35e-4          # exp(-8): the 4-sigma support boundary
FACE_CHANNEL = 3              # label = 3ch skeleton + 19 heatmaps → ch 3
HAND_CHANNELS = (-2, -1)      # joints 17 (right-hand), 18 (left-hand)


def _masked_bbox(active: jax.Array) -> Tuple[jax.Array, jax.Array,
                                             jax.Array, jax.Array,
                                             jax.Array]:
    """(H, W) bool → (ys, ye, xs, xe, found)."""
    H, W = active.shape
    ys_idx = jnp.arange(H)
    xs_idx = jnp.arange(W)
    row_any = jnp.any(active, axis=1)
    col_any = jnp.any(active, axis=0)
    found = jnp.any(row_any)
    big = jnp.iinfo(jnp.int32).max
    ys = jnp.min(jnp.where(row_any, ys_idx, big))
    ye = jnp.max(jnp.where(row_any, ys_idx, -1))
    xs = jnp.min(jnp.where(col_any, xs_idx, big))
    xe = jnp.max(jnp.where(col_any, xs_idx, -1))
    return ys, ye, xs, xe, found


def face_crop(image: jax.Array, label: jax.Array,
              thres: float = HEAT_THRES) -> jax.Array:
    """(B,H,W,C≥3) image + (B,H,W,22) label → (B,S,S,3) face crops,
    S = H//32*8 (utils.py:162-234: last 3 channels, bilinear resize)."""
    B, H, W, _ = image.shape
    S = H // 32 * 8

    def one(img, lbl):
        ys, ye, xs, xe, found = _masked_bbox(lbl[:, :, FACE_CHANNEL]
                                             > thres)
        xc = (xs + xe) // 2
        yc = (ys * 3 + ye * 2) // 5
        side = jnp.clip(((xe - xs) * 5) // 2, 32, W)
        # fallback center/size when no face pixels (utils.py:222-224)
        side = jnp.where(found, side, H // 32 * 8)
        yc = jnp.where(found, yc, H // 4)
        xc = jnp.where(found, xc, W // 2)
        yc = jnp.clip(yc, side // 2, H - 1 - side // 2)
        xc = jnp.clip(xc, side // 2, W - 1 - side // 2)
        y0 = (yc - side // 2).astype(jnp.float32)
        x0 = (xc - side // 2).astype(jnp.float32)
        scale = S / side.astype(jnp.float32)
        return jax.image.scale_and_translate(
            img[:, :, -3:], (S, S, 3),
            spatial_dims=(0, 1),
            scale=jnp.array([scale, scale]),
            translation=jnp.array([-y0 * scale, -x0 * scale]),
            method="bilinear")

    return jax.vmap(one)(image, label)


def hand_crops(image: jax.Array, label: jax.Array,
               thres: float = HEAT_THRES
               ) -> Tuple[jax.Array, jax.Array]:
    """(B,H,W,C) image + label → ((B,2,S,S,3) crops, (B,2) valid),
    S = H//64*8 (utils.py:237-294).  Both hands always produced; ``valid``
    flags which heatmaps had support."""
    B, H, W, _ = image.shape
    S = H // 64 * 8

    def one_hand(img, lbl, channel):
        ys, ye, xs, xe, found = _masked_bbox(lbl[:, :, channel] > thres)
        yc = jnp.clip((ys + ye) // 2, S // 2, H - 1 - S // 2)
        xc = jnp.clip((xs + xe) // 2, S // 2, W - 1 - S // 2)
        y0 = jnp.where(found, yc - S // 2, 0)
        x0 = jnp.where(found, xc - S // 2, 0)
        crop = jax.lax.dynamic_slice(
            img[:, :, -3:], (y0, x0, 0), (S, S, 3))
        return crop, found

    def one(img, lbl):
        crops, valids = [], []
        for ch in HAND_CHANNELS:
            c, v = one_hand(img, lbl, lbl.shape[-1] + ch)
            crops.append(c)
            valids.append(v)
        return jnp.stack(crops), jnp.stack(valids)

    return jax.vmap(one)(image, label)
