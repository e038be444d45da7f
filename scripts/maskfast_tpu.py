"""Time the parity-layout mask fast path vs the standard flax mask net
on the TPU at the rollout shapes (B=7, 320x480, bf16), and check
agreement on the same folded params.

Run:  python scripts/maskfast_tpu.py    (serialize TPU jobs)
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
    import dataclasses

    from renderloom.core.config import RendererConfig
    from renderloom.models.fastpath import (mask_apply_fast,
                                            transform_mask_params)
    from renderloom.models.renderer import MaskGenerator

    on_tpu = jax.default_backend() == "tpu"
    cdt = jnp.bfloat16 if on_tpu else jnp.float32
    H, W = 320, 480
    gcfg = RendererConfig().gen
    gcfg = dataclasses.replace(
        gcfg, mask=dataclasses.replace(gcfg.mask, weight_norm_type="none"))
    mask = MaskGenerator(gcfg, cdt)

    rng = np.random.default_rng(0)
    label = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 22)), jnp.float32)
    imgs = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 9)), jnp.float32)
    variables = mask.init(jax.random.PRNGKey(0), label, imgs)
    tp = transform_mask_params(variables["params"])

    std = jax.jit(lambda v, l, im: mask.apply(v, l, im))
    fast = jax.jit(lambda t, l, im: mask_apply_fast(t, l, im, cdt))

    a = np.asarray(std(variables, label, imgs), np.float32)
    b = np.asarray(fast(tp, label, imgs), np.float32)
    print(f"platform={jax.default_backend()}  B={B} {H}x{W} {cdt.__name__}")
    print(f"max|std-fast| = {np.abs(a - b).max():.3e}", flush=True)

    def bench(fn, *args):
        out = fn(*args)
        carry = jnp.sum(out.astype(jnp.float32)) * 1e-20
        float(carry)
        tic = time.perf_counter()
        for _ in range(reps):
            out = fn(args[0], args[1] + carry, args[2])
            carry = jnp.sum(out.astype(jnp.float32)) * 1e-20
        float(carry)
        return (time.perf_counter() - tic) / reps * 1e3

    ms_std = bench(std, variables, label, imgs)
    ms_fast = bench(fast, tp, label, imgs)
    print(f"standard {ms_std:8.2f} ms")
    print(f"fast     {ms_fast:8.2f} ms   ({ms_std / ms_fast:.2f}x)")


if __name__ == "__main__":
    main()
