"""Isolate where the mask net's milliseconds live: instance-norm cost
at both layouts, and conv-only (norm-free) time for the standard vs
parity-layout mask paths.

Run:  python scripts/norm_micro_tpu.py    (serialize TPU jobs)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from renderloom.core.cache import enable_compile_cache


def bench(fn, x, reps=30):
    jf = jax.jit(fn)
    # keep the chained carry in x's dtype: a fp32 scalar would promote
    # the bf16 input and silently retime the fp32 variant
    carry = jf(x).astype(x.dtype)
    carry = jf(x + carry).astype(x.dtype)
    float(carry)
    tic = time.perf_counter()
    for _ in range(reps):
        carry = jf(x + carry).astype(x.dtype)
    float(carry)
    return (time.perf_counter() - tic) / reps * 1e3


def main(B: int = 7):
    enable_compile_cache()
    from renderloom.models.fastpath import instance_norm_p4
    from renderloom.models.layers import instance_norm

    on_tpu = jax.default_backend() == "tpu"
    cdt = jnp.bfloat16 if on_tpu else jnp.float32
    rng = np.random.default_rng(0)
    print(f"platform={jax.default_backend()}  B={B}", flush=True)

    x_std = jnp.asarray(rng.normal(size=(B, 320, 480, 32)), cdt)
    x_p4 = jnp.asarray(rng.normal(size=(B, 160, 240, 128)), cdt)
    red = lambda y: jnp.sum(y.astype(jnp.float32)) * 1e-20

    ms = bench(lambda a: red(instance_norm(a)), x_std)
    print(f"in_std   (320x480x32)   {ms:7.2f} ms", flush=True)
    ms = bench(lambda a: red(instance_norm_p4(a)), x_p4)
    print(f"in_p4    (160x240x128)  {ms:7.2f} ms", flush=True)

    # accumulating-dtype variant: no explicit fp32 materialization
    def in_acc(x, eps=1e-5):
        m1 = jnp.mean(x, axis=(1, 2), keepdims=True,
                      dtype=jnp.float32)
        m2 = jnp.mean(jax.lax.square(x.astype(jnp.float32)),
                      axis=(1, 2), keepdims=True)
        var = jnp.maximum(m2 - jnp.square(m1), 0.0)
        scale = jax.lax.rsqrt(var + eps)
        return ((x.astype(jnp.float32) - m1) * scale).astype(x.dtype)

    ms = bench(lambda a: red(in_acc(a)), x_std)
    print(f"in_acc   (320x480x32)   {ms:7.2f} ms", flush=True)
    ms = bench(lambda a: red(in_acc(a)), x_p4)
    print(f"in_acc   (160x240x128)  {ms:7.2f} ms", flush=True)

    from renderloom.ops.norm_pallas import instance_norm_fused
    ms = bench(lambda a: red(instance_norm_fused(a)), x_std)
    print(f"in_plls  (320x480x32)   {ms:7.2f} ms", flush=True)
    ms = bench(lambda a: red(instance_norm_fused(a, parity=True)), x_p4)
    print(f"in_plls4 (160x240x128)  {ms:7.2f} ms", flush=True)

    # conv-only comparison: both mask paths with norms removed
    import dataclasses

    from renderloom.core.config import RendererConfig
    from renderloom.models import fastpath as fp
    from renderloom.models.renderer import MaskGenerator

    gcfg = RendererConfig().gen
    gcfg = dataclasses.replace(
        gcfg, mask=dataclasses.replace(gcfg.mask, weight_norm_type="none"))
    mask = MaskGenerator(gcfg, cdt)
    H, W = 320, 480
    label = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 22)), jnp.float32)
    imgs = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 9)), jnp.float32)
    variables = mask.init(jax.random.PRNGKey(0), label, imgs)
    tp = transform = fp.transform_mask_params(variables["params"])

    orig_norm = fp._norm
    import renderloom.models.layers as L
    orig_std = L.instance_norm
    from renderloom.models.layers import leaky as _leaky

    def timed_pair():
        std = bench(lambda l: red(mask.apply(variables, l, imgs)), label)
        fast = bench(lambda l: red(
            fp.mask_apply_fast(tp, l, imgs, cdt)), label)
        return std, fast

    os.environ["RENDERLOOM_PALLAS_NORM"] = "0"
    std, fast = timed_pair()
    print(f"mask std/fast XLA norms   {std:7.2f} / {fast:7.2f} ms",
          flush=True)
    os.environ["RENDERLOOM_PALLAS_NORM"] = "1"
    _, fast = timed_pair()
    print(f"mask fast PALLAS norms    {'':9s} {fast:7.2f} ms",
          flush=True)
    del os.environ["RENDERLOOM_PALLAS_NORM"]

    fp._norm = lambda h, ns, nb, parity=False, act=False: \
        _leaky(h) if act else h
    L.instance_norm = lambda x, eps=1e-5, scale=None, bias=None: x
    try:
        std, fast = timed_pair()
        print(f"mask std/fast NO norms    {std:7.2f} / {fast:7.2f} ms",
              flush=True)
    finally:
        fp._norm = orig_norm
        L.instance_norm = orig_std


if __name__ == "__main__":
    main()
