"""Parity-layout (space-to-depth) inference fast path for the mask net.

The rollout bisect (scripts/rollout_bisect_tpu.py, BASELINE.md round 3)
shows the MaskGenerator is half the generator call (26.5 / 52.7 ms at
segment-batch 7), and the fine bisect (scripts/masknet_bisect_tpu.py)
attributes it to full-resolution low-channel convs: a bare 32→32 k3
conv at 320×480 runs at ~3% MFU because 32 channels fill a quarter of
the MXU's 128 lanes (pad waste on both contraction and output lanes).

This module runs those stages in a **space-to-depth parity layout**
(spatial/4, channels×4) with *exactly transformed weights* — the fast
path is the same mathematical function as `MaskGenerator.apply` on the
same (spectral-norm-folded) parameters, verified to float tolerance in
`tests/test_fastpath.py`:

- stride-1 k3 full-res conv → k3 conv over the s2d tensor with a
  (3,3,4Cin,4Cout) zero-embedded kernel: output parity (a,b)'s taps
  land in block (a+dr)//2, input parity (a+dr)%2 — 4/9 kernel density
  but full 128-lane occupancy on both sides.
- stride-2 k3 conv → k2 conv over the s2d tensor, padding (1,0):
  the 3×3 window around full-res (2i,2j) covers s2d blocks {i-1,i}.
- nearest-upsample2x + k3 conv → k3 conv at LOW res emitting 4Cout
  parity-packed channels + depth_to_space: nearest-up duplicates
  pixels, so the 3×3 taps collapse onto low-res blocks (a+dr)//2 with
  summed weights; the upsampled tensor is never materialized.
- instance norm on a parity-packed tensor: full-res per-channel moments
  are the equal-count average of the four parity moments (the parity
  grids tile the image), so stats stay exact.

Reference workload anchor: the blend-mask net of
Pose_Guided_Neural_Rendering/models/generator.py:415-510; this file is
a TPU execution strategy for it, not a new architecture.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .layers import leaky

_DN = ("NHWC", "HWIO", "NHWC")


def space_to_depth(x: jax.Array) -> jax.Array:
    """(B, 2h, 2w, C) → (B, h, w, 4C), channel index (p·2+q)·C + c."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // 2, W // 2, 4 * C)


def depth_to_space(x: jax.Array) -> jax.Array:
    """Inverse of :func:`space_to_depth`."""
    B, h, w, C4 = x.shape
    C = C4 // 4
    x = x.reshape(B, h, w, 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, 2 * h, 2 * w, C)


def _tile4(v: jax.Array) -> jax.Array:
    """Per-channel vector → parity-packed (4C,): channel-major tile."""
    return jnp.tile(v, 4)


def w_s1_s2d(k: jax.Array) -> jax.Array:
    """Stride-1 k3 kernel (3,3,Cin,Cout) → (3,3,4Cin,4Cout) acting on
    the s2d input and emitting the s2d output (both parity-packed)."""
    ci, co = k.shape[2], k.shape[3]
    out = jnp.zeros((3, 3, 4 * ci, 4 * co), k.dtype)
    for a in (0, 1):
        for b in (0, 1):
            for dr in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    kr, kc = 1 + (a + dr) // 2, 1 + (b + dc) // 2
                    p, q = (a + dr) % 2, (b + dc) % 2
                    out = out.at[
                        kr, kc,
                        (p * 2 + q) * ci:(p * 2 + q + 1) * ci,
                        (a * 2 + b) * co:(a * 2 + b + 1) * co,
                    ].add(k[1 + dr, 1 + dc])
    return out


def w_s2_s2d(k: jax.Array) -> jax.Array:
    """Stride-2 k3 kernel (3,3,Cin,Cout) → (2,2,4Cin,Cout) acting on the
    s2d input with padding (1,0); output is the standard stride-2 grid."""
    ci = k.shape[2]
    out = jnp.zeros((2, 2, 4 * ci) + k.shape[3:], k.dtype)
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            kr, kc = 1 + dr // 2, 1 + dc // 2
            p, q = dr % 2, dc % 2
            out = out.at[
                kr, kc, (p * 2 + q) * ci:(p * 2 + q + 1) * ci, :
            ].add(k[1 + dr, 1 + dc])
    return out


def w_up_d2s(k: jax.Array) -> jax.Array:
    """nearest-up2x→k3-conv kernel (3,3,Cin,Cout) → (3,3,Cin,4Cout)
    applied at LOW resolution; depth_to_space of the output equals the
    original upsample-then-conv to float tolerance."""
    co = k.shape[3]
    out = jnp.zeros(k.shape[:3] + (4 * co,), k.dtype)
    for a in (0, 1):
        for b in (0, 1):
            for dr in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    kr, kc = 1 + (a + dr) // 2, 1 + (b + dc) // 2
                    out = out.at[
                        kr, kc, :, (a * 2 + b) * co:(a * 2 + b + 1) * co
                    ].add(k[1 + dr, 1 + dc])
    return out


def instance_norm_p4(x: jax.Array, scale: Optional[jax.Array] = None,
                     bias: Optional[jax.Array] = None,
                     eps: float = 1e-5) -> jax.Array:
    """Instance norm over a parity-packed tensor with FULL-RES stats:
    per-(parity,channel) moments averaged over the 4 equal-count parity
    grids (exact; layers.py:instance_norm semantics).  ``scale``/``bias``
    are already parity-tiled (4C,)."""
    B, _, _, C4 = x.shape
    C = C4 // 4
    x32 = x.astype(jnp.float32)
    m1 = jnp.mean(x32, axis=(1, 2)).reshape(B, 4, C).mean(axis=1)
    m2 = jnp.mean(jnp.square(x32), axis=(1, 2)).reshape(B, 4, C) \
        .mean(axis=1)
    var = jnp.maximum(m2 - jnp.square(m1), 0.0)
    m1 = jnp.tile(m1, (1, 4))[:, None, None, :]
    rs = jnp.tile(jax.lax.rsqrt(var + eps), (1, 4))[:, None, None, :]
    out = ((x32 - m1) * rs).astype(x.dtype)
    if scale is not None:
        out = out * scale
    if bias is not None:
        out = out + bias
    return out


def _conv(x, k, b=None, padding="SAME"):
    y = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), padding, dimension_numbers=_DN)
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def _cb(p):
    """Pull {kernel, bias, norm scale/bias} out of a folded ConvBlock
    param subtree (SNConv name 'conv' → nn.Conv name 'conv')."""
    out = {"k": p["conv"]["conv"]["kernel"],
           "b": p["conv"]["conv"]["bias"]}
    if "norm" in p:
        out["ns"], out["nb"] = p["norm"]["scale"], p["norm"]["bias"]
    return out


def transform_mask_params(mask_params: dict, num_downsamples: int = 3,
                          num_res_blocks: int = 4) -> dict:
    """One-time transform of folded MaskGenerator params into the
    parity-layout kernels.  Call OUTSIDE jit (e.g. next to
    fold_spectral_norm) and pass the result into the rollout."""

    @jax.jit
    def build(mp):
        tp = {}
        for pre in ("lbl", "img"):
            cb = _cb(mp[f"{pre}_in"])
            tp[f"{pre}_in"] = {"k": w_s1_s2d(cb["k"]),
                               "b": _tile4(cb["b"]),
                               "ns": _tile4(cb["ns"]),
                               "nb": _tile4(cb["nb"])}
            for i in range(num_downsamples):
                cb = _cb(mp[f"{pre}_down{i}"])
                tp[f"{pre}_down{i}"] = {"k": w_s2_s2d(cb["k"]),
                                        "b": cb["b"], "ns": cb["ns"],
                                        "nb": cb["nb"]}
        for i in range(num_res_blocks):
            rp = mp[f"res{i}"]
            r = {}
            for j in (0, 1):
                r[f"k{j}"] = rp[f"conv{j}"]["conv"]["kernel"]
                r[f"b{j}"] = rp[f"conv{j}"]["conv"]["bias"]
                r[f"ns{j}"] = rp[f"norm{j}"]["scale"]
                r[f"nb{j}"] = rp[f"norm{j}"]["bias"]
            if "conv_s" in rp:
                r["ks"] = rp["conv_s"]["conv"]["kernel"]
                r["bs"] = rp["conv_s"]["conv"]["bias"]
                r["nss"] = rp["norm_s"]["scale"]
                r["nbs"] = rp["norm_s"]["bias"]
            tp[f"res{i}"] = r
        for i in reversed(range(num_downsamples)):
            cb = _cb(mp[f"up{i}"])
            tp[f"up{i}"] = {"k": w_up_d2s(cb["k"]),
                            "b": _tile4(cb["b"]),
                            "ns": _tile4(cb["ns"]),
                            "nb": _tile4(cb["nb"])}
        cb = _cb(mp["conv_mask"])
        tp["head"] = {"k": w_s1_s2d(cb["k"]), "b": _tile4(cb["b"])}
        return tp

    return build(mask_params)


def _in_std(x, ns, nb, eps=1e-5):
    x32 = x.astype(jnp.float32)
    m1 = jnp.mean(x32, axis=(1, 2), keepdims=True)
    m2 = jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True)
    var = jnp.maximum(m2 - jnp.square(m1), 0.0)
    out = ((x32 - m1) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return out * ns + nb


def use_pallas_norm() -> bool:
    """Fused Pallas instance norm on TPU (exact; inference only).
    Override with RENDERLOOM_PALLAS_NORM=0/1."""
    import os
    env = os.environ.get("RENDERLOOM_PALLAS_NORM")
    if env is not None:
        return env not in ("0", "false", "")
    return jax.default_backend() == "tpu"


def _norm(h, ns, nb, parity=False, act=False):
    """Instance norm (+affine, optional fused leaky) picking the Pallas
    kernel on TPU and the XLA path elsewhere — same function either way
    (tests/test_norm_pallas.py)."""
    if use_pallas_norm():
        try:
            from renderloom.ops.norm_pallas import instance_norm_fused
            from .layers import LEAKY_SLOPE
            return instance_norm_fused(
                h, ns, nb, parity=parity,
                slope=LEAKY_SLOPE if act else None)
        except ValueError:
            pass                        # no aligned tile: XLA fallback
    out = instance_norm_p4(h, ns, nb) if parity else _in_std(h, ns, nb)
    return leaky(out) if act else out


def mask_apply_fast(tp: dict, label: jax.Array, imgs: jax.Array,
                    cdt=jnp.float32, num_downsamples: int = 3,
                    num_res_blocks: int = 4) -> jax.Array:
    """Parity-layout MaskGenerator forward: same function as
    ``MaskGenerator.apply`` on the original (folded) params to float
    tolerance.  ``label`` (B,H,W,22), ``imgs`` (B,H,W,9); H, W must be
    divisible by 2^num_downsamples."""

    def enc(x, pre):
        p = tp[f"{pre}_in"]
        h = _conv(space_to_depth(x.astype(cdt)), p["k"], p["b"])
        h = _norm(h, p["ns"], p["nb"], parity=True, act=True)
        for i in range(num_downsamples):
            p = tp[f"{pre}_down{i}"]
            # the in-conv's packed output IS s2d of its full-res tensor,
            # so down0 consumes it directly; later downs re-pack
            if i > 0:
                h = space_to_depth(h)
            h = _conv(h, p["k"], p["b"], padding=((1, 0), (1, 0)))
            h = _norm(h, p["ns"], p["nb"], act=True)
        return h

    h = jnp.concatenate([enc(label, "lbl"), enc(imgs, "img")], axis=-1)

    for i in range(num_res_blocks):
        r = tp[f"res{i}"]
        y = _conv(h, r["k0"], r["b0"])
        y = _norm(y, r["ns0"], r["nb0"], act=True)
        y = _conv(y, r["k1"], r["b1"])
        y = _norm(y, r["ns1"], r["nb1"])
        if "ks" in r:
            s = _norm(_conv(h, r["ks"], r["bs"]), r["nss"], r["nbs"])
        else:
            s = h
        h = s + y

    for i in reversed(range(1, num_downsamples)):
        p = tp[f"up{i}"]
        h = _conv(h, p["k"], p["b"])
        h = depth_to_space(_norm(h, p["ns"], p["nb"], parity=True,
                                 act=True))
    p = tp["up0"]                       # stay parity-packed for the head
    h = _norm(_conv(h, p["k"], p["b"]), p["ns"], p["nb"], parity=True,
              act=True)
    m = _conv(h, tp["head"]["k"], tp["head"]["b"])
    return jax.nn.sigmoid(depth_to_space(m))


def transform_embed_params(embed_params: dict,
                           num_downsamples: int) -> dict:
    """Folded LabelEmbedder params → parity-layout kernels: conv_first
    via the stride-1 s2d embedding, every stride-2 down via the k2 s2d
    form (generator.py:306-410 workload)."""

    @jax.jit
    def build(ep):
        tp = {"first": {
            "k": w_s1_s2d(ep["conv_first"]["conv"]["kernel"]),
            "b": _tile4(ep["conv_first"]["conv"]["bias"])}}
        for i in range(num_downsamples):
            c = ep[f"down_{i}"]["conv"]
            tp[f"down_{i}"] = {"k": w_s2_s2d(c["kernel"]),
                               "b": c["bias"]}
        return tp

    return build(embed_params)


def embed_apply_fast(tp: dict, x: jax.Array, cdt=jnp.float32,
                     num_downsamples: int = 4):
    """Parity-layout LabelEmbedder forward — same level maps as
    ``LabelEmbedder.apply`` on the original params to float tolerance.
    Returns ``num_downsamples + 1`` standard-layout maps."""
    hp = leaky(_conv(space_to_depth(x.astype(cdt)), tp["first"]["k"],
                     tp["first"]["b"]))
    levels = [depth_to_space(hp)]
    h = hp                              # packed == s2d of level 0
    for i in range(num_downsamples):
        if i > 0:
            h = space_to_depth(h)
        p = tp[f"down_{i}"]
        h = leaky(_conv(h, p["k"], p["b"], padding=((1, 0), (1, 0))))
        levels.append(h)
    return levels


def use_fastpath() -> bool:
    """Default policy: parity-layout inference on TPU (where low-channel
    lane padding is the bottleneck); standard flax path elsewhere.
    Override with RENDERLOOM_FASTPATH=0/1."""
    import os
    env = os.environ.get("RENDERLOOM_FASTPATH")
    if env is not None:
        return env not in ("0", "false", "")
    return jax.default_backend() == "tpu"


class FastInferenceGen:
    """Duck-typed ``Generator`` for the inference rollouts
    (train/gan.py:make_rollout / make_segment_rollout): flax trunk with
    ``with_mask=False``, parity-layout mask net on the transformed
    params injected by :func:`fold_fast_params` under ``__fast__``.

    Same function as the standard generator on the same folded params
    (tests/test_fastpath.py::test_fast_gen_matches_flax).
    """

    def __init__(self, gen):
        from .renderer import Generator
        self.cfg = gen.cfg
        self.dtype = gen.dtype
        self.trunk = Generator(gen.cfg, gen.dtype, with_mask=False)

    def apply(self, variables, label, label_prev, img_warped, img_prev,
              update_stats: bool = False):
        params = variables["params"]
        cond = embed_apply_fast(
            params["__fast__"]["embed"],
            jnp.concatenate([img_warped, img_prev], axis=-1),
            self.dtype, self.cfg.embed.num_downsamples)
        img, _ = self.trunk.apply(
            {"params": params,
             "batch_stats": variables.get("batch_stats", {})},
            label, label_prev, img_warped, img_prev,
            update_stats=False, cond_maps=cond)
        imgs = jnp.concatenate(
            [img_prev.astype(self.dtype), img_warped.astype(self.dtype),
             img.astype(self.dtype)], axis=-1)
        m = self.cfg.mask
        mask = mask_apply_fast(params["__fast__"]["mask"],
                               label.astype(self.dtype), imgs, self.dtype,
                               num_downsamples=m.num_downsamples,
                               num_res_blocks=m.num_res_blocks)
        return img, mask.astype(img.dtype)


def fold_fast_params(folded_params: dict, gen_cfg) -> dict:
    """Attach the parity-layout mask + embedder kernels to a
    spectral-norm-folded param tree (under ``__fast__``, ignored by the
    flax trunk).  Pair with :class:`FastInferenceGen`."""
    m = gen_cfg.mask
    out = dict(folded_params)
    out["__fast__"] = {
        "mask": transform_mask_params(folded_params["mask_net"],
                                      m.num_downsamples,
                                      m.num_res_blocks),
        "embed": transform_embed_params(folded_params["ref_embed"],
                                        gen_cfg.embed.num_downsamples),
    }
    return out
