"""Fine-grained mask-net bisect on the TPU.

rollout_bisect_tpu.py showed the MaskGenerator is 26.5 ms of the 52.7
ms generator call (B=7, 320x480) — half the rollout stage.  This times
its internal stages at the exact shapes (fresh params; timing depends
only on shape/dtype), plus isolated primitives, to find where the
milliseconds live:

  enc_lbl   — full-res 22→32 conv + 3 stride-2 downs  (320x480 → 40x60)
  enc_img   — same on the 9ch image stream
  res       — 4 x ResBlockCNACN(256) at 40x60 (512ch concat input)
  dec       — 3 x (nearest-up2x + conv) + 1ch sigmoid head back to full res
  in_full   — bare instance_norm at (B,320,480,32)
  conv_full — bare 32→32 k3 conv at full res

Run:  python scripts/masknet_bisect_tpu.py    (serialize TPU jobs)
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


def main(B: int = 7, reps: int = 20):
    enable_compile_cache()

    import flax.linen as nn

    from renderloom.models.layers import (ConvBlock, ResBlockCNACN,
                                          instance_norm, upsample2x)

    on_tpu = jax.default_backend() == "tpu"
    cdt = jnp.bfloat16 if on_tpu else jnp.float32
    H, W = 320, 480
    nf, down, nres = 32, 3, 4

    def filters(i):
        return min(nf * (2 ** i), 512)

    class Encoder(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = ConvBlock(nf, spectral=False, dtype=cdt, name="in")(x)
            for i in range(down):
                h = ConvBlock(filters(i + 1), stride=2, spectral=False,
                              dtype=cdt, name=f"d{i}")(h)
            return h

    class Res(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(nres):
                x = ResBlockCNACN(filters(down), spectral=False,
                                  dtype=cdt, name=f"r{i}")(x)
            return x

    class Dec(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in reversed(range(down)):
                x = upsample2x(x)
                x = ConvBlock(filters(i), spectral=False, dtype=cdt,
                              name=f"u{i}")(x)
            return ConvBlock(1, spectral=False, norm="none",
                             activation="sigmoid", dtype=cdt,
                             name="head")(x)

    rng = np.random.default_rng(0)
    Hd, Wd = H // 2 ** down, W // 2 ** down
    cases = [
        ("enc_lbl", Encoder(), (B, H, W, 22)),
        ("enc_img", Encoder(), (B, H, W, 9)),
        ("res", Res(), (B, Hd, Wd, 2 * filters(down))),
        ("dec", Dec(), (B, Hd, Wd, filters(down))),
    ]
    print(f"platform={jax.default_backend()}  B={B} {H}x{W}", flush=True)

    def bench(fn, x):
        jf = jax.jit(fn)
        # keep the chained carry in x's dtype: a fp32 scalar would
        # promote a bf16 input and silently retime the fp32 variant
        carry = jf(x).astype(x.dtype)
        carry = jf(x + carry).astype(x.dtype)
        float(carry)
        tic = time.perf_counter()
        for _ in range(reps):
            carry = jf(x + carry).astype(x.dtype)
        float(carry)
        return (time.perf_counter() - tic) / reps * 1e3

    for name, mod, shape in cases:
        x = jnp.asarray(rng.uniform(-1, 1, shape), jnp.float32)
        params = mod.init(jax.random.PRNGKey(0), x)
        ms = bench(
            lambda a, m=mod, p=params: jnp.sum(
                m.apply(p, a).astype(jnp.float32)) * 1e-20, x)
        print(f"{name:<10s} {ms:8.2f} ms", flush=True)

    x = jnp.asarray(rng.uniform(-1, 1, (B, H, W, nf)), cdt)
    ms = bench(lambda a: jnp.sum(
        instance_norm(a).astype(jnp.float32)) * 1e-20, x)
    print(f"{'in_full':<10s} {ms:8.2f} ms", flush=True)

    conv = nn.Conv(nf, (3, 3), padding="SAME", dtype=cdt,
                   param_dtype=jnp.float32)
    cp = conv.init(jax.random.PRNGKey(0), x)
    ms = bench(lambda a: jnp.sum(
        conv.apply(cp, a).astype(jnp.float32)) * 1e-20, x)
    print(f"{'conv_full':<10s} {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
