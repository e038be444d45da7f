"""A/B the stride-1 full-res conv strategies on the TPU at the mask
net's worst shape (B=7, 320x480, 32→32 k3, bf16):

  std    — plain NHWC conv at full res (32/128 lanes: the 3% MFU case)
  s2d9   — zero-embedded (3,3,128,128) conv at 160x240
           (w_s1_s2d: 4x FLOPs, full lanes)
  s2d4   — four per-parity (2,2,128,32) convs + channel concat
           (16/36 of s2d9's FLOPs, out lanes quarter-filled)
  in22   — the encoder's actual 22→32 first conv, std vs s2d9

Run:  python scripts/parity_conv_micro_tpu.py   (serialize TPU jobs)
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


def w_s1_parity(k):
    """Per-parity k2 kernels: out[(a,b)] = conv2(s2d(x), K_ab) with
    padding chosen per parity — no zero taps, 16/36 of the dense-s2d
    FLOPs.  Returns {(a, b): (2,2,4Cin,Cout), padding}."""
    ci, co = k.shape[2], k.shape[3]
    outs = {}
    for a in (0, 1):
        for b in (0, 1):
            w = jnp.zeros((2, 2, 4 * ci, co), k.dtype)
            for dr in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    # block offset relative to the k2 footprint origin:
                    # a=0 covers blocks {-1,0} (pad (1,0)); a=1 covers
                    # {0,1} (pad (0,1))
                    br, bc = (a + dr) // 2, (b + dc) // 2
                    kr = br + (1 if a == 0 else 0)
                    kc = bc + (1 if b == 0 else 0)
                    p, q = (a + dr) % 2, (b + dc) % 2
                    w = w.at[kr, kc,
                             (p * 2 + q) * ci:(p * 2 + q + 1) * ci,
                             :].add(k[1 + dr, 1 + dc])
            pad = ((1, 0) if a == 0 else (0, 1),
                   (1, 0) if b == 0 else (0, 1))
            outs[(a, b)] = (w, pad)
    return outs


def main(B: int = 7, reps: int = 30):
    enable_compile_cache()
    from renderloom.models.fastpath import (depth_to_space,
                                            space_to_depth, w_s1_s2d)

    on_tpu = jax.default_backend() == "tpu"
    cdt = jnp.bfloat16 if on_tpu else jnp.float32
    H, W = 320, 480
    DN = ("NHWC", "HWIO", "NHWC")
    rng = np.random.default_rng(0)
    print(f"platform={jax.default_backend()}  B={B} {H}x{W}", flush=True)

    def bench(fn, x):
        jf = jax.jit(fn)
        # keep the chained carry in x's dtype: a fp32 scalar would
        # promote the bf16 input and retrace with mismatched dtypes
        carry = jf(x).astype(x.dtype)
        carry = jf(x + carry).astype(x.dtype)
        float(carry)
        tic = time.perf_counter()
        for _ in range(reps):
            carry = jf(x + carry).astype(x.dtype)
        float(carry)
        return (time.perf_counter() - tic) / reps * 1e3

    for ci, co in ((32, 32), (22, 32)):
        x = jnp.asarray(rng.normal(size=(B, H, W, ci)), cdt)
        k = jnp.asarray(rng.normal(size=(3, 3, ci, co)) * 0.1,
                        jnp.float32)
        red = lambda y: jnp.sum(y.astype(jnp.float32)) * 1e-20

        kc = k.astype(cdt)
        ms = bench(lambda a: red(jax.lax.conv_general_dilated(
            a, kc, (1, 1), "SAME", dimension_numbers=DN)), x)
        print(f"{ci}->{co} std   {ms:7.2f} ms", flush=True)

        k9 = w_s1_s2d(k).astype(cdt)
        ms = bench(lambda a: red(jax.lax.conv_general_dilated(
            space_to_depth(a), k9, (1, 1), "SAME",
            dimension_numbers=DN)), x)
        print(f"{ci}->{co} s2d9  {ms:7.2f} ms", flush=True)

        k4 = {ab: (w.astype(cdt), pad)
              for ab, (w, pad) in w_s1_parity(k).items()}

        def f4(a, k4=k4):
            xp = space_to_depth(a)
            outs = [jax.lax.conv_general_dilated(
                xp, k4[(p, q)][0], (1, 1), k4[(p, q)][1],
                dimension_numbers=DN)
                for p in (0, 1) for q in (0, 1)]
            return red(jnp.concatenate(outs, axis=-1))

        ms = bench(f4, x)
        print(f"{ci}->{co} s2d4  {ms:7.2f} ms", flush=True)

    # correctness spot-check of the per-parity form (fp32, CPU ok)
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 3)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 5)), jnp.float32)
    ref = jax.lax.conv_general_dilated(x, k, (1, 1), ((1, 1), (1, 1)),
                                       dimension_numbers=DN)
    xp = space_to_depth(x)
    outs = []
    for p in (0, 1):
        for q in (0, 1):
            w, pad = w_s1_parity(k)[(p, q)]
            outs.append(jax.lax.conv_general_dilated(
                xp, w, (1, 1), pad, dimension_numbers=DN))
    got = depth_to_space(jnp.concatenate(outs, axis=-1))
    err = float(jnp.abs(got - ref).max())
    print(f"s2d4 exactness max|err| = {err:.2e}", flush=True)
    assert err < 1e-4, err


if __name__ == "__main__":
    main()
