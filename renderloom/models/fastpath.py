"""Parity-layout (space-to-depth) inference fast path for the full
generator: label embedder + SPADE trunk + blend-mask net.

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

Reference workload anchor: the vid2vid-style generator of
Pose_Guided_Neural_Rendering/models/generator.py:35-510 (embedder
306-410, trunk 104-234, mask net 415-510); this file is a TPU execution
strategy for it, not a new architecture.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .layers import avg_pool_3x3s2, leaky, upsample2x

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
    xf = x.astype(jnp.float32)
    # shifted one-pass fp32 moments (layers.instance_norm rationale:
    # one-pass bandwidth, two-pass stability).  The shift must be the
    # SAME per-(B,C) value across the 4 parity blocks for the combined
    # moments to stay exact algebra — parity-average the row-0 means.
    s = jax.lax.stop_gradient(
        jnp.mean(xf[:, :1], axis=(1, 2)).reshape(B, 4, C).mean(axis=1))
    s4 = jnp.tile(s, (1, 4))[:, None, None, :]
    d = xf - s4
    m1 = jnp.mean(d, axis=(1, 2)).reshape(B, 4, C).mean(axis=1)
    m2 = jnp.mean(jax.lax.square(d), axis=(1, 2)) \
        .reshape(B, 4, C).mean(axis=1)
    var = jnp.maximum(m2 - jax.lax.square(m1), 0.0)
    a = jnp.tile(jax.lax.rsqrt(var + eps), (1, 4))[:, None, None, :]
    if scale is not None:
        a = a * scale
    out = (d - jnp.tile(m1, (1, 4))[:, None, None, :]) * a
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


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
                # all but the last down norm AFTER re-packing (see
                # mask_apply_fast.enc) → parity-tiled norm params
                last = i + 1 == num_downsamples
                tp[f"{pre}_down{i}"] = {
                    "k": w_s2_s2d(cb["k"]), "b": cb["b"],
                    "ns": cb["ns"] if last else _tile4(cb["ns"]),
                    "nb": cb["nb"] if last else _tile4(cb["nb"])}
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
    # standard-layout instance norm — exactly layers.instance_norm
    # (shifted one-pass fp32 moments; see its docstring)
    from renderloom.models.layers import instance_norm
    return instance_norm(x, eps=eps, scale=ns, bias=nb)


_PALLAS_NORM_OK: Optional[bool] = None


def _pallas_norm_compiles() -> bool:
    """Probe-compile the fused norm once (fp32 + bf16, real Mosaic
    lowering on TPU).  A Pallas compile error surfaces when the OUTER
    jit compiles — after _norm's trace-time try/except has returned —
    so it would crash inference instead of falling back; this eager
    probe catches it up front and disables the kernel globally."""
    global _PALLAS_NORM_OK
    if _PALLAS_NORM_OK is None:
        try:
            from renderloom.ops.norm_pallas import instance_norm_fused
            for dt in (jnp.float32, jnp.bfloat16):
                jax.block_until_ready(
                    instance_norm_fused(jnp.ones((1, 16, 16, 8), dt)))
                # the parity reduction lowers differently (lane
                # rotations) — probe it too: round-3's non-parity-only
                # probe let a parity Mosaic failure crash inference
                jax.block_until_ready(
                    instance_norm_fused(jnp.ones((1, 16, 16, 16), dt),
                                        parity=True))
            _PALLAS_NORM_OK = True
        except Exception:                # Mosaic/XLA compiler errors
            _PALLAS_NORM_OK = False
    return _PALLAS_NORM_OK


def _pallas_norm_max_batch() -> int:
    import os

    return int(os.environ.get("RENDERLOOM_PALLAS_NORM_MAX_B", "7"))


def use_pallas_norm(parity: bool = False, batch: Optional[int] = None,
                    ) -> bool:
    """Fused Pallas instance norm (exact; inference only) — shape-aware
    default from the corrected round-4 micro (scripts/norm_micro_tpu.py
    after the bf16-carry fix, BASELINE.md queue-4 section) plus the
    round-5 serving A/B (queue-5c Pallas vs queue-5e XLA, same commit):

    * parity/packed tensors at single-clip segment batch (B ≤ 7): the
      kernel WINS — 1.6× in the micro (1.63 vs 2.62 ms at
      7×160×240×128), and in situ 133.0 vs 105.5 f/s at clips=1
      → **default ON on TPU**, gated by the eager compile probe
      (`_pallas_norm_compiles`) so a Mosaic regression falls back
      instead of crashing inference.
    * batched serving programs (B > 7, i.e. multi-clip): XLA wins —
      170.5 vs 163.2 f/s at clips=8, 147.9 vs 143.4 at clips=2: the
      VMEM tile cap retiles the C=512 trunk norms (2400→1200 rows) and
      the kernel loses its margin → default OFF past
      ``RENDERLOOM_PALLAS_NORM_MAX_B`` (default 7, one clip's segment
      batch).
    * unpacked low-channel tensors: XLA's fusion wins (1.79 vs
      3.37 ms at 7×320×480×32) → default OFF.

    RENDERLOOM_PALLAS_NORM overrides all of this: ``1`` forces ON
    everywhere and skips the probe (measurement sweeps want the compile
    error loud), any other truthy value forces ON behind the probe,
    ``0`` forces OFF."""
    import os

    from renderloom.ops import target_is_tpu
    env = os.environ.get("RENDERLOOM_PALLAS_NORM")
    if env is not None:
        if env in ("0", "false", ""):
            return False
        return env == "1" or _pallas_norm_compiles()
    if not parity or not target_is_tpu():
        return False
    if batch is not None and batch > _pallas_norm_max_batch():
        return False
    if jax.default_backend() != "tpu":
        # cross-host export for a TPU target: the eager Mosaic probe
        # can't run here — lowering errors surface at export time
        return True
    return _pallas_norm_compiles()


def _norm(h, ns, nb, parity=False, act=False):
    """Instance norm (+affine, optional fused leaky) picking the Pallas
    kernel on TPU for parity/packed tensors at single-clip batch
    (measured 1.6× there, BASELINE.md queue-4 norm micro; serving A/B
    queue-5c/5e picks XLA past B=7) and the XLA path elsewhere — same
    function either way (tests/test_norm_pallas.py)."""
    if use_pallas_norm(parity=parity, batch=int(h.shape[0])):
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
                    num_res_blocks: int = 4,
                    label_packed: Optional[bool] = None) -> jax.Array:
    """Parity-layout MaskGenerator forward: same function as
    ``MaskGenerator.apply`` on the original (folded) params to float
    tolerance.  ``label`` (B,H,W,22) — or already parity-packed
    (B,H/2,W/2,88), e.g. straight from the fused rasterizer's packed
    layout; ``imgs`` (B,H,W,9); H, W must be divisible by
    2^num_downsamples."""
    assert num_downsamples >= 1, "packed head needs >= 1 downsample"
    if label_packed is None:
        label_packed = label.shape[-1] == 4 * 22

    def enc(x, pre, packed=False):
        p = tp[f"{pre}_in"]
        h = _conv(x.astype(cdt) if packed
                  else space_to_depth(x.astype(cdt)), p["k"], p["b"])
        h = _norm(h, p["ns"], p["nb"], parity=True, act=True)
        for i in range(num_downsamples):
            p = tp[f"{pre}_down{i}"]
            # the in-conv's packed output IS s2d of its full-res tensor,
            # so down0 consumes it directly; each later down consumes
            # the previous one's re-packed output
            h = _conv(h, p["k"], p["b"], padding=((1, 0), (1, 0)))
            if i + 1 < num_downsamples:
                # pack BEFORE the norm: the next down conv wants the
                # packed rep anyway, and the parity norm at 4C fills
                # lanes a std norm at C < 128 leaves idle (exact — s2d
                # permutes pixels; stats average over parity groups)
                h = space_to_depth(h)
                h = _norm(h, p["ns"], p["nb"], parity=True, act=True)
            else:
                h = _norm(h, p["ns"], p["nb"], act=True)
        return h

    h = jnp.concatenate([enc(label, "lbl", packed=label_packed),
                         enc(imgs, "img")], axis=-1)

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
                     num_downsamples: int = 4, return_packed=False):
    """Parity-layout LabelEmbedder forward — same level maps as
    ``LabelEmbedder.apply`` on the original params to float tolerance.
    Returns ``num_downsamples + 1`` standard-layout maps; with
    ``return_packed`` also the parity-packed reps of levels
    0..num_downsamples−1 (each stride-2 conv consumes the packed rep of
    its input level anyway, so these are free — the packed trunk reuses
    them as its SPADE conditions)."""
    hp = leaky(_conv(space_to_depth(x.astype(cdt)), tp["first"]["k"],
                     tp["first"]["b"]))
    levels = [depth_to_space(hp)]
    packed = [hp]                       # packed == s2d of level 0
    h = hp
    for i in range(num_downsamples):
        if i > 0:
            h = space_to_depth(h)
            packed.append(h)
        p = tp[f"down_{i}"]
        h = leaky(_conv(h, p["k"], p["b"], padding=((1, 0), (1, 0))))
        levels.append(h)
    if return_packed:
        return levels, packed
    return levels


def avg_pool_s2d(xp: jax.Array) -> jax.Array:
    """torch ``AvgPool2d(3, 2, padding=1, count_include_pad=True)`` on a
    parity-packed tensor → standard-layout output at the packed spatial
    resolution (generator.py:127 semantics): the 3×3 window around
    full-res (2i, 2j) covers packed blocks {i-1, i} at fixed parities —
    nine shifted parity slices, no materialized full-res tensor."""
    B, h, w, C4 = xp.shape
    C = C4 // 4
    par = jnp.pad(xp.reshape(B, h, w, 4, C),
                  ((0, 0), (1, 0), (1, 0), (0, 0), (0, 0)))
    taps = ((0, 1), (1, 0), (1, 1))     # (row offset into pad, parity)
    acc = None
    for orr, p in taps:
        for occ, q in taps:
            s = par[:, orr:orr + h, occ:occ + w, p * 2 + q, :]
            acc = s if acc is None else acc + s
    return acc / 9.0


def _tile_k1(k: jax.Array) -> jax.Array:
    """k1 pointwise kernel (1,1,Cin,Cout) → grouped-conv kernel for a
    parity-packed input: groups=4, out group-major (= parity-major)."""
    return jnp.tile(k, (1, 1, 1, 4))


def _conv_k1_p4(x, k, b=None):
    y = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), "SAME", dimension_numbers=_DN,
        feature_group_count=4)
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def _spade_std(x, cond, ak, ab):
    """Standard-layout SPADE (renderer.py:Spade, k1 affine)."""
    out = _norm(x, None, None)
    B, H, W, _ = x.shape
    if cond.shape[1] != H or cond.shape[2] != W:
        cond = jax.image.resize(
            cond, (cond.shape[0], H, W, cond.shape[-1]), method="nearest")
    affine = _conv(cond, ak, ab)
    gamma, beta = jnp.split(affine, 2, axis=-1)
    return out * (1.0 + gamma) + beta


def _spade_p4(xp, cond_p, ak4, ab4):
    """Parity-packed SPADE: param-free parity-stat norm + grouped k1
    affine over the packed condition (same resolution by construction).
    ``ak4`` (1,1,C_e,4·2C) is the tiled affine kernel."""
    C = ak4.shape[-1] // 8
    out = _norm(xp, None, None, parity=True)
    affine = _conv_k1_p4(cond_p, ak4, ab4)       # (B,h,w,4·2C)
    B, h, w, _ = affine.shape
    a = affine.reshape(B, h, w, 4, 2 * C)
    gamma = a[..., :C].reshape(B, h, w, 4 * C)
    beta = a[..., C:].reshape(B, h, w, 4 * C)
    return out * (1.0 + gamma) + beta


def _spade_block_p4(xp, cond_p, bp):
    """Parity-packed SpadeResBlock (renderer.py:SpadeResBlock order)."""
    h = _spade_p4(xp, cond_p, bp["a0k"], bp["a0b"])
    h = _conv(leaky(h), bp["k0"], bp["b0"])
    h = _spade_p4(h, cond_p, bp["a1k"], bp["a1b"])
    h = _conv(leaky(h), bp["k1"], bp["b1"])
    if "ks" in bp:
        s = _spade_p4(xp, cond_p, bp["ask"], bp["asb"])
        s = _conv_k1_p4(s, bp["ks"], bp["bs"])
    else:
        s = xp
    return s + h


def _spade_block_std(x, cond, bp):
    h = _spade_std(x, cond, bp["a0k"], bp["a0b"])
    h = _conv(leaky(h), bp["k0"], bp["b0"])
    h = _spade_std(h, cond, bp["a1k"], bp["a1b"])
    h = _conv(leaky(h), bp["k1"], bp["b1"])
    if "ks" in bp:
        s = _spade_std(x, cond, bp["ask"], bp["asb"])
        s = _conv(s, bp["ks"], bp["bs"])
    else:
        s = x
    return s + h


def _sp(p):
    """SpadeResBlock param subtree → flat kernels."""
    out = {"a0k": p["spade0"]["affine"]["kernel"],
           "a0b": p["spade0"]["affine"]["bias"],
           "k0": p["conv0"]["conv"]["kernel"],
           "b0": p["conv0"]["conv"]["bias"],
           "a1k": p["spade1"]["affine"]["kernel"],
           "a1b": p["spade1"]["affine"]["bias"],
           "k1": p["conv1"]["conv"]["kernel"],
           "b1": p["conv1"]["conv"]["bias"]}
    if "conv_s" in p:
        out.update({"ask": p["spade_s"]["affine"]["kernel"],
                    "asb": p["spade_s"]["affine"]["bias"],
                    "ks": p["conv_s"]["conv"]["kernel"],
                    "bs": p["conv_s"]["conv"]["bias"]})
    return out


def _sp_p4(p):
    """Parity-packed SpadeResBlock kernels: k3 convs via the s2d
    embedding, k1 affines/shortcut via grouped tiling."""
    f = _sp(p)
    out = {"a0k": _tile_k1(f["a0k"]), "a0b": _tile4(f["a0b"]),
           "k0": w_s1_s2d(f["k0"]), "b0": _tile4(f["b0"]),
           "a1k": _tile_k1(f["a1k"]), "a1b": _tile4(f["a1b"]),
           "k1": w_s1_s2d(f["k1"]), "b1": _tile4(f["b1"])}
    if "ks" in f:
        out.update({"ask": _tile_k1(f["ask"]), "asb": _tile4(f["asb"]),
                    "ks": _tile_k1(f["ks"]), "bs": _tile4(f["bs"])})
    return out


def trunk_packed_levels() -> int:
    """How many trunk pyramid levels run in the parity-packed layout:
    level i covers blocks ``down_i``/``up_i`` (at 1/2^i resolution,
    ``num_filters·2^i`` channels — 16/32/64/... with the shipped config,
    so levels past 0 are still below the 128 TPU lanes).  Default 2 —
    the round-4 v5e sweep (scripts/fastgen_tpu.py, BASELINE.md): full
    generator at segment-batch 7 runs 77.8 ms packed=1, 74.8 packed=2
    (best), 75.1 packed=3, vs 123.1 standard.  Override with
    RENDERLOOM_PACKED_LEVELS.  Capped at num_downsamples — the
    bottleneck res blocks always run standard."""
    import os
    return max(1, int(os.environ.get("RENDERLOOM_PACKED_LEVELS", "2")))


def transform_trunk_params(params: dict, gen_cfg,
                           packed_levels: Optional[int] = None) -> dict:
    """Folded Generator trunk params → fast-path kernels: pyramid levels
    below ``packed_levels`` (down_first, down_i/up_i, conv_img —
    generator.py:104-129, 181-234 workload) in the parity layout,
    everything else flat standard kernels.  Requires
    spade_kernel_size == 1 (the shipped config, configs/HSM.yaml:48)."""
    assert gen_cfg.spade_kernel_size == 1, "packed SPADE needs k1 affine"
    n_down = gen_cfg.num_downsamples
    n_res = int(-(-(gen_cfg.num_layers - n_down) // 2) * 2)
    if packed_levels is None:
        packed_levels = trunk_packed_levels()
    kL = max(1, min(packed_levels, n_down))

    @jax.jit
    def build(p):
        tp = {"down_first": {
            "k": w_s1_s2d(p["down_first"]["kernel"]),
            "b": _tile4(p["down_first"]["bias"])}}
        for i in range(n_down + 1):
            f = _sp_p4 if i < kL else _sp
            tp[f"down_{i}"] = f(p[f"down_{i}"])
            tp[f"up_{i}"] = f(p[f"up_{i}"])
        for i in range(n_res):
            tp[f"res_{i}"] = _sp(p[f"res_{i}"])
        tp["conv_img"] = {"k": w_s1_s2d(p["conv_img"]["conv"]["kernel"]),
                          "b": _tile4(p["conv_img"]["conv"]["bias"])}
        return tp

    return build(params)


def trunk_apply_fast(tp: dict, label: jax.Array, cond_maps, cond_packed,
                     cdt, gen_cfg,
                     packed_levels: Optional[int] = None) -> jax.Array:
    """Pure-function Generator trunk (generator.py:104-129,181-234
    order; renderer.py:Generator semantics) with pyramid levels below
    ``packed_levels`` in the parity layout (must match the value
    ``transform_trunk_params`` was built with).  ``cond_maps``:
    standard-layout embedder levels; ``cond_packed``: their packed reps
    for levels 0..num_downsamples−1 (``embed_apply_fast`` computes them
    for free).  Returns the tanh image, full-res standard."""
    n_down = gen_cfg.num_downsamples
    n_res = int(-(-(gen_cfg.num_layers - n_down) // 2) * 2)
    n_embed = gen_cfg.embed.num_downsamples
    if packed_levels is None:
        packed_levels = trunk_packed_levels()
    kL = max(1, min(packed_levels, n_down))

    # a label wider than input_label_nc is the rasterizer's pre-packed
    # (4·nc) parity layout — consume it directly
    lp = label.astype(cdt) if label.shape[-1] != gen_cfg.input_label_nc \
        else space_to_depth(label.astype(cdt))
    x = _conv(lp, tp["down_first"]["k"], tp["down_first"]["b"])
    for i in range(n_down + 1):
        j = min(n_embed, i)
        if i < kL:
            x = _spade_block_p4(x, cond_packed[j].astype(cdt),
                                tp[f"down_{i}"])
            if i != n_down:
                # packed→(packed|std) 3×3/s2 avg-pool at the packed res
                pooled = avg_pool_s2d(x)
                x = space_to_depth(pooled) if i + 1 < kL else pooled
        else:
            x = _spade_block_std(x, cond_maps[j].astype(cdt),
                                 tp[f"down_{i}"])
            if i != n_down:
                x = avg_pool_3x3s2(x)

    j = min(n_embed, n_down + 1)
    for i in range(n_res):
        x = _spade_block_std(x, cond_maps[j].astype(cdt), tp[f"res_{i}"])

    for i in range(n_down, -1, -1):
        j = min(n_embed, i)
        if i < kL:
            x = _spade_block_p4(x, cond_packed[j].astype(cdt),
                                tp[f"up_{i}"])
            if i != 0:
                # packed level-(i−1) input to up_{i−1}: s2d(up2x(y)) ==
                # channel-tile of y (nearest-up duplicates each pixel
                # into all four parities)
                x = jnp.tile(depth_to_space(x), (1, 1, 1, 4))
        else:
            x = _spade_block_std(x, cond_maps[j].astype(cdt),
                                 tp[f"up_{i}"])
            if i != 0:
                x = jnp.tile(x, (1, 1, 1, 4)) if i - 1 < kL \
                    else upsample2x(x)

    img = _conv(leaky(x), tp["conv_img"]["k"], tp["conv_img"]["b"])
    return jnp.tanh(depth_to_space(img))


def use_fastpath() -> bool:
    """Default policy: parity-layout inference on TPU (where low-channel
    lane padding is the bottleneck); standard flax path elsewhere.
    Override with RENDERLOOM_FASTPATH=0/1.

    ON by the in-situ A/B (whole bench pipeline, identical everything
    but this flag, 2026-08-19 queue-4): fast 102.6 vs standard
    84.07 f/s (BASELINE.md "In-situ fast-path A/B")."""
    import os
    env = os.environ.get("RENDERLOOM_FASTPATH")
    if env is not None:
        return env not in ("0", "false", "")
    return jax.default_backend() == "tpu"


class FastInferenceGen:
    """Duck-typed ``Generator`` for the inference rollouts
    (train/gan.py:make_rollout / make_segment_rollout): pure-function
    embedder + SPADE trunk + mask net with the full-resolution stages in
    the parity layout, on the transformed params injected by
    :func:`fold_fast_params` under ``__fast__``.

    Same function as the standard generator on the same folded params
    (tests/test_fastpath.py::test_fast_gen_matches_flax_rollout).
    """

    def __init__(self, gen):
        self.cfg = gen.cfg
        self.dtype = gen.dtype

    def apply(self, variables, label, label_prev, img_warped, img_prev,
              update_stats: bool = False):
        params = variables["params"]
        fast = params["__fast__"]
        cond, cond_packed = embed_apply_fast(
            fast["embed"],
            jnp.concatenate([img_warped, img_prev], axis=-1),
            self.dtype, self.cfg.embed.num_downsamples,
            return_packed=True)
        img = trunk_apply_fast(fast["trunk"], label, cond, cond_packed,
                               self.dtype, self.cfg)
        imgs = jnp.concatenate(
            [img_prev.astype(self.dtype), img_warped.astype(self.dtype),
             img.astype(self.dtype)], axis=-1)
        m = self.cfg.mask
        mask = mask_apply_fast(
            params["__fast__"]["mask"], label.astype(self.dtype), imgs,
            self.dtype, num_downsamples=m.num_downsamples,
            num_res_blocks=m.num_res_blocks,
            label_packed=label.shape[-1] != self.cfg.input_label_nc)
        return img, mask.astype(img.dtype)


def fold_fast_params(folded_params: dict, gen_cfg) -> dict:
    """Attach the parity-layout mask + embedder + trunk kernels to a
    spectral-norm-folded param tree under ``__fast__``.  Pair with
    :class:`FastInferenceGen`."""
    m = gen_cfg.mask
    out = dict(folded_params)
    out["__fast__"] = {
        "mask": transform_mask_params(folded_params["mask_net"],
                                      m.num_downsamples,
                                      m.num_res_blocks),
        "embed": transform_embed_params(folded_params["ref_embed"],
                                        gen_cfg.embed.num_downsamples),
        "trunk": transform_trunk_params(folded_params, gen_cfg),
    }
    return out
