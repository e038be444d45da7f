"""Renderer building blocks: spectral-norm convs, instance norm, SPADE.

The reference composes these via imaginaire's order-string machinery
(``Pose_Guided_Neural_Rendering/models/layers/conv.py:14-135``,
``residual.py:16-151``, ``activation_norm.py:109-234``).  renderloom keeps
only the variants the shipped config actually instantiates, as explicit
flax modules (SURVEY.md §7.4):

* ``SNConv`` — conv with optional spectral weight norm (power-iteration
  state lives in the ``batch_stats`` collection via flax's SpectralNorm,
  matching torch's update-on-forward-in-train-mode semantics);
* ``instance_norm`` — per-sample per-channel spatial normalization;
* ``Spade`` — param-free instance norm + per-condition 1×1 conv producing
  pixelwise (γ, β): ``out = norm(x)·(1+γ)+β`` (activation_norm.py:211-234);
* ``SpadeResBlock`` — pre-act 'NACNAC' residual block with SPADE norms
  and a norm→1×1-conv learned shortcut when channel counts differ
  (residual.py:59-151, generator.py:88-93);
* ``ConvBlock`` — conv→instance-norm→leaky 'CNA' block (conv.py order
  machinery) used by the mask net and discriminators;
* ``ResBlockCNACN`` — the mask net's post-act residual block
  (generator.py:466-476).

Layout: NHWC (TPU-native; the reference is NCHW).  Leaky slope 0.2
(``layers/nonlinearity.py:22``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

LEAKY_SLOPE = 0.2


def leaky(x):
    return nn.leaky_relu(x, negative_slope=LEAKY_SLOPE)


def _in_moments(x: jax.Array, eps: float):
    """Per-(B,C) mean + rsqrt(var+eps) over H, W — SHIFTED one-pass.

    With s any per-(B,C) constant, ``var = E[(x−s)²] − E[x−s]²`` is
    exact algebra.  s is a SINGLE data sample (pixel (0,0) per (B,C)):
    one element-per-group read, so the two moment reductions stay the
    only full pass over x — a row/strided-sample shift (round-4)
    serialized an extra pass over x ahead of the fused moments, and
    the GAN-regression bisect (BASELINE.md round-5) measured exactly
    that as lost step time.  Any in-distribution sample gives the
    stability we need: the fp32 cancellation in m2 − m1² scales with
    ((mean−s)/std)², and even a k-sigma-outlier shift keeps ~24−2·log2(k)
    bits of variance precision, vs s=0 which loses ALL of them when
    |mean| ≫ std (large conv bias — ADVICE r3; the two-pass fix cost a
    third full read, 18% off the GAN step)."""
    xf = x.astype(jnp.float32)
    if x.shape[1] == 0 or x.shape[2] == 0:
        # zero-sized spatial extent (deep tiny-input pyramids): no
        # sample to shift by; moments are NaN either way, like the
        # unshifted form
        s = jnp.zeros((x.shape[0], 1, 1, x.shape[3]), jnp.float32)
    else:
        s = jax.lax.slice(xf, (0, 0, 0, 0),
                          (xf.shape[0], 1, 1, xf.shape[3]))
    m1 = jnp.mean(xf - s, axis=(1, 2), keepdims=True)
    m2 = jnp.mean(jax.lax.square(xf - s), axis=(1, 2), keepdims=True)
    var = jnp.maximum(m2 - jax.lax.square(m1), 0.0)
    return s, m1, jax.lax.rsqrt(var + eps)


def _in_apply(x, s, m1, inv, scale, bias):
    """Centered apply in TWO stages — ``((x − s) − m1)·inv·γ + β``:
    the mean must never be rounded at the data's magnitude.  Folding
    μ = s + m1 into one fp32 scalar quantizes it to the ulp of s (at
    mean 4096 that is 2.4e-4 ≈ 2.4% of a 1e-2 std), while x − s is
    exact (Sterbenz) and m1 is a small number with full precision.
    Same reason the folded ``a·x + b`` form is out
    (tests/test_layers_extra.py::test_instance_norm_large_mean_…).
    Result stays in compute dtype (VERDICT r2 #1)."""
    out = (x.astype(jnp.float32) - s - m1) * inv
    if scale is not None:
        out = out * scale
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


def _sum_to(g: jax.Array, shape) -> jax.Array:
    """Sum a cotangent down to a broadcastable parameter shape."""
    extra = g.ndim - len(shape)
    if extra:
        g = g.sum(axis=tuple(range(extra)))
    axes = tuple(i for i, s in enumerate(shape) if s == 1 and
                 g.shape[i] != 1)
    return g.sum(axis=axes, keepdims=True) if axes else g


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(3,))
def _instance_norm_vjp(x, scale, bias, eps):
    s, m1, inv = _in_moments(x, eps)
    return _in_apply(x, s, m1, inv, scale, bias)


def _in_fwd(x, scale, bias, eps):
    s, m1, inv = _in_moments(x, eps)
    return (_in_apply(x, s, m1, inv, scale, bias),
            (x, s, m1, inv, scale, bias))


def _in_bwd(eps, res, dy):
    """Hand-written IN backward: residuals are x (compute dtype, a conv
    output that lives in HBM anyway) + per-(B,C) scalars — autodiff of
    the forward instead saved a full fp32 centered copy of every
    normed activation, which cost the GAN train step 21% (r3→r4
    regression, BASELINE.md round-5 bisect).  Standard normalization
    VJP: dx = inv·(g − E[g] − x̂·E[g·x̂]) with g = dy·γ; exact
    including eps because x̂ is defined with the same rsqrt(var+eps)."""
    x, s, m1, inv, scale, bias = res
    dyf = dy.astype(jnp.float32)
    xhat = (x.astype(jnp.float32) - s - m1) * inv
    g = dyf * scale if scale is not None else dyf
    mg = jnp.mean(g, axis=(1, 2), keepdims=True)
    mgx = jnp.mean(g * xhat, axis=(1, 2), keepdims=True)
    dx = ((g - mg - xhat * mgx) * inv).astype(x.dtype)
    dscale = (_sum_to(dyf * xhat, scale.shape).astype(scale.dtype)
              if scale is not None else None)
    dbias = (_sum_to(dyf, bias.shape).astype(bias.dtype)
             if bias is not None else None)
    return dx, dscale, dbias


_instance_norm_vjp.defvjp(_in_fwd, _in_bwd)


def instance_norm(x: jax.Array, eps: float = 1e-5,
                  scale: Optional[jax.Array] = None,
                  bias: Optional[jax.Array] = None) -> jax.Array:
    """Per-(sample, channel) normalization over H, W.  NHWC.

    Statistics accumulate in float32 even under bfloat16 compute (bf16
    variance accumulation visibly degrades normalization quality).
    The implementation DISPATCHES ON INPUT DTYPE — the round-5
    GAN-regression bisect (BASELINE.md round-5; same-block driver-
    protocol A/B) measured every shift-exact scheme 10–19% off the
    whole train step vs the folded one-pass, because the data-dependent
    shift serializes a reduction ahead of the fused moments and the
    centered apply denies XLA the single folded ``a·x + b`` pass:

    * **bfloat16 inputs** (the TPU compute path) → one-pass moments
      with the centered apply downcast BEFORE the affine
      (``r3centered`` — the full same-block A/B: r3centered 7.112,
      onepass 6.398, centered 6.223, vjp 5.708, shifted 5.628 w/s;
      the affine then runs as its own trivially-differentiable layer,
      which is worth 11% of the whole train step over folding
      scale into the rsqrt scalars.  NOTE: affine call sites return
      float32 — scale/bias are fp32 params — and every consumer conv
      casts back to compute dtype; forcing the downcast inside the
      norm was measured 14% slower).  Safe BY REPRESENTABILITY: a
      bf16 tensor cannot
      carry structure finer than ulp ≈ |mean|/256, so the regime the
      shift protects (|mean|/std ≫ 2⁸, where fp32 ``E[x²]−E[x]²``
      cancels catastrophically) is already quantized away at the
      input.  Within the representable regime the scheme error
      (fp32 accumulation rounding + cancellation, ≈
      eps_fp32·log₂(HW)·(mean/std)² of var — worst ~0.3σ at the
      mean/std=2⁸ extreme) stays below the input's own quantization
      noise (ulp(mean)/std = 2σ at that same extreme)
      (tests/test_layers_extra.py::test_instance_norm_bf16_dispatch…).
    * **float32 inputs** (CPU tests, fp32 users) → shift-exact custom
      VJP (``vjp``): moments shifted by a per-(B,C) data sample
      (`_in_moments`), centered apply (`_in_apply`), hand-written
      backward (`_in_bwd`) whose residuals are x + scalars.  Survives
      mean=4096/std=1e-2 (the ADVICE-r3 contract,
      test_instance_norm_large_mean_numerically_stable).

    ``RENDERLOOM_NORM_IMPL`` overrides the dispatch for A/B
    measurement (scripts/gan_norm_bisect_tpu.py): ``vjp``, ``onepass``
    (r3 body), ``shifted`` (r4 body: same shifted math under plain
    autodiff — saves a full fp32 centered residual per norm),
    ``twopass`` (mean then centered variance — a third full read)."""
    import os
    impl = os.environ.get("RENDERLOOM_NORM_IMPL")
    if impl is None:
        impl = "r3centered" if x.dtype == jnp.bfloat16 else "vjp"
    if impl == "vjp":
        return _instance_norm_vjp(x, scale, bias, eps)
    if impl == "shifted":               # r4 body (e4d47af), for A/B
        xf = x.astype(jnp.float32)
        s = jax.lax.stop_gradient(
            jnp.mean(xf[:, :1], axis=(1, 2), keepdims=True))
        d = xf - s
        m1 = jnp.mean(d, axis=(1, 2), keepdims=True)
        m2 = jnp.mean(jax.lax.square(d), axis=(1, 2), keepdims=True)
        var = jnp.maximum(m2 - jax.lax.square(m1), 0.0)
        a = jax.lax.rsqrt(var + eps)
        if scale is not None:
            a = a * scale
        out = (d - m1) * a
        return (out + bias if bias is not None else out).astype(x.dtype)
    if impl == "onepass":               # r3 body (130c004), for A/B
        m1 = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
        m2 = jnp.mean(jax.lax.square(x.astype(jnp.float32)),
                      axis=(1, 2), keepdims=True)
        var = jnp.maximum(m2 - jnp.square(m1), 0.0)
        a = jax.lax.rsqrt(var + eps)
        if scale is not None:
            a = a * scale
        b = -m1 * a
        if bias is not None:
            b = b + bias
        return (x.astype(jnp.float32) * a + b).astype(x.dtype)
    if impl == "centered":   # onepass moments + centered fp32 apply
        m1 = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
        m2 = jnp.mean(jax.lax.square(x.astype(jnp.float32)),
                      axis=(1, 2), keepdims=True)
        var = jnp.maximum(m2 - jnp.square(m1), 0.0)
        a = jax.lax.rsqrt(var + eps)
        if scale is not None:
            a = a * scale
        out = (x.astype(jnp.float32) - m1) * a
        return (out + bias if bias is not None else out).astype(x.dtype)
    if impl == "r3centered":            # exact 89d3c7c body (the 7.05
        # w/s control), incl. its fp32 promotion of affine outputs
        x32 = x.astype(jnp.float32)
        m1 = jnp.mean(x32, axis=(1, 2), keepdims=True)
        m2 = jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True)
        var = jnp.maximum(m2 - jnp.square(m1), 0.0)
        out = ((x32 - m1) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
        if scale is not None:
            out = out * scale
        if bias is not None:
            out = out + bias
        return out
    if impl == "twopass":               # advisor fix (270eaa4), for A/B
        m1 = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
        c = x.astype(jnp.float32) - m1
        var = jnp.mean(jax.lax.square(c), axis=(1, 2), keepdims=True)
        a = jax.lax.rsqrt(var + eps)
        if scale is not None:
            a = a * scale
        out = c * a
        return (out + bias if bias is not None else out).astype(x.dtype)
    raise ValueError(f"unknown RENDERLOOM_NORM_IMPL {impl!r}")


class InstanceNorm(nn.Module):
    """Affine instance norm (torch ``InstanceNorm2d(affine=True)`` as the
    imaginaire factory defaults it, activation_norm.py:399-402)."""

    affine: bool = True

    @nn.compact
    def __call__(self, x):
        if not self.affine:
            return instance_norm(x)
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        return instance_norm(x, scale=scale, bias=bias)


class SNConv(nn.Module):
    """Conv (NHWC) with optional spectral weight normalization.

    Spectral norm maintains a power-iteration ``u`` vector in the
    ``batch_stats`` collection; pass ``update_stats=True`` during training
    so it tracks the current weights (matching torch's
    ``spectral_norm`` update-on-forward behavior, the reference's
    ``weight_norm_type: spectral`` everywhere, configs/HSM.yaml:49).
    """

    features: int
    kernel: int = 3
    stride: int = 1
    spectral: bool = True
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        # torch-style symmetric padding, NOT XLA "SAME": identical for
        # stride 1 / odd kernels, but for stride-2 convs "SAME" pads
        # (0, 1) while torch's padding=k//2 effectively pads (1, 0) —
        # a shifted sampling grid that breaks checkpoint-import parity
        # (conv.py's torch.nn.Conv2d padding semantics)
        p = (self.kernel - 1) // 2
        conv = nn.Conv(self.features, (self.kernel, self.kernel),
                       strides=(self.stride, self.stride),
                       padding=((p, p), (p, p)),
                       use_bias=self.use_bias, dtype=self.dtype,
                       param_dtype=jnp.float32, name="conv")
        if not self.spectral:
            return conv(x)
        return nn.SpectralNorm(conv, name="sn")(x,
                                                update_stats=update_stats)


class ConvBlock(nn.Module):
    """'CNA': conv → (instance norm) → leaky (conv.py order machinery;
    the mask/discriminator configuration)."""

    features: int
    kernel: int = 3
    stride: int = 1
    spectral: bool = True
    norm: str = "instance"          # 'instance' | 'none'
    activation: str = "leaky"       # 'leaky' | 'none' | 'sigmoid'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        x = SNConv(self.features, self.kernel, self.stride, self.spectral,
                   dtype=self.dtype, name="conv")(x, update_stats)
        if self.norm == "instance":
            x = InstanceNorm(name="norm")(x)
        if self.activation == "leaky":
            x = leaky(x)
        elif self.activation == "sigmoid":
            x = jax.nn.sigmoid(x)
        return x


class Spade(nn.Module):
    """SPADE conditional norm (activation_norm.py:109-234).

    The shipped config uses ``num_filters=0`` (generator.py:83-85) so the
    per-condition MLP collapses to a single k×k conv (k=1,
    configs/HSM.yaml:48) producing 2C channels chunked into (γ, β); the
    inner norm is param-free instance norm; the condition map is
    nearest-resized to the feature size.
    """

    features: int
    kernel: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond):
        out = instance_norm(x)
        B, H, W, _ = x.shape
        if cond.shape[1] != H or cond.shape[2] != W:
            cond = jax.image.resize(
                cond, (cond.shape[0], H, W, cond.shape[-1]),
                method="nearest")
        affine = nn.Conv(2 * self.features, (self.kernel, self.kernel),
                         padding="SAME", dtype=self.dtype,
                         param_dtype=jnp.float32, name="affine")(cond)
        gamma, beta = jnp.split(affine, 2, axis=-1)
        return out * (1.0 + gamma) + beta


class SpadeResBlock(nn.Module):
    """Pre-act SPADE residual block, order 'NACNAC' (residual.py:59-151
    with generator.py:88-93's parameters).

    hidden = min(in, out); learned shortcut (SPADE-norm → 1×1 spectral
    conv, no activation) when channel counts differ.
    """

    features: int                   # output channels
    kernel: int = 3
    spade_kernel: int = 1
    spectral: bool = True
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond, update_stats: bool = False):
        in_ch = x.shape[-1]
        hidden = min(in_ch, self.features)

        def branch(mdl, x, cond, update_stats):
            h = Spade(in_ch, mdl.spade_kernel, mdl.dtype,
                      name="spade0")(x, cond)
            h = leaky(h)
            h = SNConv(hidden, mdl.kernel, 1, mdl.spectral,
                       dtype=mdl.dtype, name="conv0")(h, update_stats)
            h = Spade(hidden, mdl.spade_kernel, mdl.dtype,
                      name="spade1")(h, cond)
            h = leaky(h)
            h = SNConv(mdl.features, mdl.kernel, 1, mdl.spectral,
                       dtype=mdl.dtype, name="conv1")(h, update_stats)
            return h

        if self.remat:
            branch = nn.remat(branch, static_argnums=(3,))
        dx = branch(self, x, cond, update_stats)

        if in_ch != self.features:
            s = Spade(in_ch, self.spade_kernel, self.dtype,
                      name="spade_s")(x, cond)
            s = SNConv(self.features, 1, 1, self.spectral,
                       dtype=self.dtype, name="conv_s")(s, update_stats)
        else:
            s = x
        return s + dx


class ResBlockCNACN(nn.Module):
    """Post-act residual block 'CNACN' with instance norms
    (generator.py:462-476): conv→IN→leaky → conv→IN, plus a conv→IN
    shortcut when channels differ."""

    features: int
    kernel: int = 3
    spectral: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        in_ch = x.shape[-1]
        hidden = min(in_ch, self.features)
        h = SNConv(hidden, self.kernel, 1, self.spectral,
                   dtype=self.dtype, name="conv0")(x, update_stats)
        h = InstanceNorm(name="norm0")(h)
        h = leaky(h)
        h = SNConv(self.features, self.kernel, 1, self.spectral,
                   dtype=self.dtype, name="conv1")(h, update_stats)
        h = InstanceNorm(name="norm1")(h)
        if in_ch != self.features:
            s = SNConv(self.features, 1, 1, self.spectral,
                       dtype=self.dtype, name="conv_s")(x, update_stats)
            s = InstanceNorm(name="norm_s")(s)
        else:
            s = x
        return s + h


class NonLocalBlock(nn.Module):
    """SAGAN self-attention block (non_local.py:12-78; available in the
    reference's layer library, unused by the shipped configs).

    θ/φ/g 1×1 convs (C/8, C/8, C/2), 2×2 max-pool on φ and g, softmax
    attention, 1×1 out-projection back to C, residual with a learnable
    scale initialized to 0.  One ``jnp.einsum`` per product so XLA maps
    the attention matmuls onto the MXU."""

    spectral: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        B, H, W, C = x.shape
        theta = SNConv(C // 8, 1, 1, self.spectral, use_bias=False,
                       dtype=self.dtype, name="theta")(x, update_stats)
        phi = SNConv(C // 8, 1, 1, self.spectral, use_bias=False,
                     dtype=self.dtype, name="phi")(x, update_stats)
        g = SNConv(C // 2, 1, 1, self.spectral, use_bias=False,
                   dtype=self.dtype, name="g")(x, update_stats)
        phi = nn.max_pool(phi, (2, 2), strides=(2, 2))
        g = nn.max_pool(g, (2, 2), strides=(2, 2))
        q = theta.reshape(B, H * W, C // 8)
        k = phi.reshape(B, -1, C // 8)
        v = g.reshape(B, -1, C // 2)
        attn = jax.nn.softmax(jnp.einsum("bqc,bkc->bqk", q, k), axis=-1)
        out = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(B, H, W, C // 2)
        out = SNConv(C, 1, 1, self.spectral, use_bias=False,
                     dtype=self.dtype, name="out")(out, update_stats)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return x + gamma * out


class PartialConv(nn.Module):
    """Mask-normalized convolution (NVIDIA partial conv for inpainting;
    conv.py:593-803 in the reference's layer library, unused by the
    shipped configs).

    ``__call__(x, mask)`` → ``(out, new_mask)``: the conv sees only valid
    pixels, outputs are rescaled by (window size / valid count), and the
    mask dilates to anywhere the window touched a valid pixel.  The mask
    path is a parameter-free ones-kernel conv, fused by XLA."""

    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        k, s = self.kernel, self.stride
        conv = nn.Conv(self.features, (k, k), strides=(s, s),
                       padding="SAME", use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32, name="conv")
        raw = conv(x * mask)
        ones_kernel = jnp.ones((k, k, 1, 1), raw.dtype)
        valid = jax.lax.conv_general_dilated(
            mask.astype(raw.dtype), ones_kernel, (s, s), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        ratio = jnp.where(valid > 0, (k * k) / jnp.maximum(valid, 1e-8),
                          0.0)
        out = raw * ratio
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            out = jnp.where(valid > 0, out + bias, 0.0)
        return out, (valid > 0).astype(mask.dtype)


class ApplyNoise(nn.Module):
    """Learnable-scale gaussian noise injection (misc.py:9-29 in the
    reference's layer library; unused by the shipped configs).  The
    scale starts at 0 → identity until training moves it."""

    @nn.compact
    def __call__(self, x, key=None):
        scale = self.param("scale", nn.initializers.zeros, (1,))
        if key is None:
            return x
        noise = jax.random.normal(key, x.shape[:-1] + (1,), x.dtype)
        return x + scale * noise


def hyper_conv2d(x: jax.Array, kernel: jax.Array,
                 bias: jax.Array | None = None,
                 stride: int = 1) -> jax.Array:
    """Per-sample convolution with externally supplied weights (the
    reference's ``HyperConv2d``, conv.py:511-590 — available in its layer
    library, unused by the shipped configs).

    ``x``: (B, H, W, Cin); ``kernel``: (B, kh, kw, Cin, Cout) — one
    filter bank per sample; ``bias``: (B, Cout) or None.  Implemented as
    ``vmap`` over the batch of a standard XLA conv, which the compiler
    lowers to one batched MXU conv."""

    def one(xi, ki):
        return jax.lax.conv_general_dilated(
            xi[None], ki, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]

    out = jax.vmap(one)(x, kernel)
    if bias is not None:
        out = out + bias[:, None, None, :]
    return out


def weight_demodulated_conv2d(x: jax.Array, kernel: jax.Array,
                              style: jax.Array, eps: float = 1e-8,
                              stride: int = 1) -> jax.Array:
    """StyleGAN2 weight demodulation (the reference's
    ``WeightDemodulation``, weight_norm.py:14-68 — available, unused by
    the shipped configs).

    ``kernel``: (kh, kw, Cin, Cout) shared weights; ``style``: (B, Cin)
    per-sample modulation.  w' = w·style, demodulated per output channel
    by 1/√Σw'², applied as a per-sample conv via :func:`hyper_conv2d`."""
    w = kernel[None] * style[:, None, None, :, None]     # (B,kh,kw,Ci,Co)
    denom = jnp.sqrt(jnp.sum(w ** 2, axis=(1, 2, 3), keepdims=True) + eps)
    return hyper_conv2d(x, w / denom, stride=stride)


def avg_pool_3x3s2(x: jax.Array) -> jax.Array:
    """torch ``AvgPool2d(3, stride=2, padding=1)`` with
    count_include_pad=True (generator.py:127).  NHWC."""
    return nn.avg_pool(x, (3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)),
                       count_include_pad=True)


def upsample2x(x: jax.Array) -> jax.Array:
    """Nearest ×2 (torch ``F.interpolate(scale_factor=2)``,
    generator.py:128)."""
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, 2 * H, 2 * W, C), method="nearest")


class LayerNorm2d(nn.Module):
    """Per-sample layer norm over ALL of (H, W, C) with per-channel
    affine (activation_norm.py:329-374 in the reference's layer library,
    unused by the shipped configs).  Matches the reference's unbiased
    (ddof=1) std and its γ ~ U[0,1) init."""

    eps: float = 1e-5
    affine: bool = True

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        flat = x.reshape(B, -1).astype(jnp.float32)
        mean = flat.mean(axis=1)
        std = flat.std(axis=1, ddof=1)
        shape = (B,) + (1,) * (x.ndim - 1)
        out = (x - mean.reshape(shape)) / (std.reshape(shape) + self.eps)
        if self.affine:
            C = x.shape[-1]
            gamma = self.param("gamma", nn.initializers.uniform(scale=1.0),
                               (C,))
            beta = self.param("beta", nn.initializers.zeros, (C,))
            out = out * gamma + beta
        return out.astype(x.dtype)


class HyperSpade(nn.Module):
    """SPADE whose first condition's affine conv weights may be supplied
    externally per-sample (activation_norm.py:237-326 — the 'hyper'
    variant, unused by the shipped configs).

    ``cond_inputs`` is a sequence whose elements are either a condition
    map or a ``(condition, mask)`` pair; masked conditions have their
    (γ, β) gated by ``1 - mask`` as in the reference.  ``norm_weights``
    = (kernel (B,kh,kw,Cin,2C), bias (B,2C) or None) routes condition 0
    through :func:`hyper_conv2d`; otherwise condition 0 gets a regular
    learned conv like the rest."""

    features: int
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond_inputs, norm_weights=None):
        out = instance_norm(x)
        B, H, W, _ = x.shape
        for i, ci in enumerate(cond_inputs):
            if ci is None:
                continue
            cond, mask = ci if isinstance(ci, (tuple, list)) else (ci, None)
            if cond.shape[1] != H or cond.shape[2] != W:
                cond = jax.image.resize(
                    cond, (cond.shape[0], H, W, cond.shape[-1]),
                    method="nearest")
            if i == 0 and norm_weights is not None:
                kern, bias = norm_weights
                affine = hyper_conv2d(cond, kern, bias)
            else:
                affine = nn.Conv(2 * self.features,
                                 (self.kernel, self.kernel),
                                 padding="SAME", dtype=self.dtype,
                                 param_dtype=jnp.float32,
                                 name=f"affine_{i}")(cond)
            gamma, beta = jnp.split(affine, 2, axis=-1)
            if mask is not None:
                if mask.shape[1] != H or mask.shape[2] != W:
                    mask = jax.image.resize(
                        mask, (mask.shape[0], H, W, mask.shape[-1]),
                        method="linear")
                gamma = gamma * (1.0 - mask)
                beta = beta * (1.0 - mask)
            out = out * (1.0 + gamma) + beta
        return out


class PartialConvBlock(nn.Module):
    """'CNA' block over a partial conv, threading the validity mask —
    the explicit-module equivalent of the reference's multi-output conv
    block machinery (conv.py:806-917 ``MultiOutConv2dBlock``, whose only
    multi-output member is PartialConv2d's mask)."""

    features: int
    kernel: int = 3
    stride: int = 1
    norm: str = "instance"          # 'instance' | 'none'
    activation: str = "leaky"       # 'leaky' | 'none'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        x, mask = PartialConv(self.features, self.kernel, self.stride,
                              dtype=self.dtype, name="pconv")(x, mask)
        if self.norm == "instance":
            x = InstanceNorm(name="norm")(x)
        if self.activation == "leaky":
            x = leaky(x)
        return x, mask


class PartialResBlock(nn.Module):
    """Residual block of partial convolutions, order 'CNACNA', threading
    the validity mask through both convs (residual.py:881-1111
    ``PartialRes2d/3dBlock``; unused by the shipped configs).  The
    shortcut is identity when channels match, else a 1×1 partial conv
    (masked shortcut as in the reference's ``learn_shortcut`` path)."""

    features: int
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        h, m = PartialConv(self.features, self.kernel,
                           dtype=self.dtype, name="pconv0")(x, mask)
        h = leaky(InstanceNorm(name="norm0")(h))
        h, m = PartialConv(self.features, self.kernel,
                           dtype=self.dtype, name="pconv1")(h, m)
        h = leaky(InstanceNorm(name="norm1")(h))
        if x.shape[-1] != self.features:
            s, _ = PartialConv(self.features, 1, dtype=self.dtype,
                               name="pconv_s")(x, mask)
        else:
            s = x
        return s + h, m


class PartialConv3d(nn.Module):
    """3D partial convolution over NDHWC volumes (conv.py:927-1072
    ``PartialConv3d``; unused by the shipped configs — carried for layer
    -library parity).  Same mask-renormalization rule as 2D."""

    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        k, s = self.kernel, self.stride
        conv = nn.Conv(self.features, (k, k, k), strides=(s, s, s),
                       padding="SAME", use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32, name="conv")
        raw = conv(x * mask)
        ones_kernel = jnp.ones((k, k, k, 1, 1), raw.dtype)
        valid = jax.lax.conv_general_dilated(
            mask.astype(raw.dtype), ones_kernel, (s, s, s), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        ratio = jnp.where(valid > 0,
                          (k ** 3) / jnp.maximum(valid, 1e-8), 0.0)
        out = raw * ratio
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            out = jnp.where(valid > 0, out + bias, 0.0)
        return out, (valid > 0).astype(mask.dtype)
