"""Microbench of dense backward-warp strategies on the TPU.

The e2e profile (BASELINE.md round 3) shows flow backgrounds at 252
ms/clip — 46% of the pipeline — and ~56 full-resolution bilinear warps
dominate that stage.  TPU gathers are the suspect: each warp is 4
row-gathers of (H·W, C=3) with the 3-wide channel dim padded to 128
lanes.  This measures alternatives on real hardware:

  gather4      — current ops.image.bilinear_sample (4 corner gathers)
  gather1      — single take over stacked corner indices
  gather-1d    — flattened 1-D gather (channel-major indices)
  shift-sep R  — separable horizontal+vertical shift-and-blend: bounded
                 |flow| <= R, (2R+2) fused select/mul-adds per axis, no
                 gather (exact for locally-smooth flow up to the
                 separability approximation)

Run: python scripts/warp_micro_tpu.py   (serialize TPU jobs)
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
from renderloom.ops.image import bilinear_sample


def warp_gather4(img, flow):
    H, W, _ = img.shape
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    return bilinear_sample(img, xs + flow[..., 0], ys + flow[..., 1],
                           mode="nearest")


def warp_gather1(img, flow):
    # one gather over all four stacked corner index sets
    H, W, C = img.shape
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    sx = jnp.clip(xs + flow[..., 0], 0.0, W - 1.0)
    sy = jnp.clip(ys + flow[..., 1], 0.0, H - 1.0)
    x0 = jnp.floor(sx); y0 = jnp.floor(sy)
    wx = (sx - x0)[..., None]; wy = (sy - y0)[..., None]
    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
    x1i = jnp.clip(x0i + 1, 0, W - 1); y1i = jnp.clip(y0i + 1, 0, H - 1)
    idx = jnp.stack([y0i * W + x0i, y0i * W + x1i,
                     y1i * W + x0i, y1i * W + x1i])      # (4, H, W)
    v = jnp.take(img.reshape(H * W, C), idx.reshape(-1), axis=0)
    v = v.reshape((4, H, W, C))
    return ((1 - wx) * (1 - wy) * v[0] + wx * (1 - wy) * v[1]
            + (1 - wx) * wy * v[2] + wx * wy * v[3])


def warp_gather1d(img, flow):
    # channel-major flattened 1-D gather
    H, W, C = img.shape
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    sx = jnp.clip(xs + flow[..., 0], 0.0, W - 1.0)
    sy = jnp.clip(ys + flow[..., 1], 0.0, H - 1.0)
    x0 = jnp.floor(sx); y0 = jnp.floor(sy)
    wx = (sx - x0)[..., None]; wy = (sy - y0)[..., None]
    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
    x1i = jnp.clip(x0i + 1, 0, W - 1); y1i = jnp.clip(y0i + 1, 0, H - 1)
    flat = jnp.moveaxis(img, -1, 0).reshape(C, H * W)
    idx = jnp.stack([y0i * W + x0i, y0i * W + x1i,
                     y1i * W + x0i, y1i * W + x1i]).reshape(4, -1)
    v = flat[:, idx]                                 # (C, 4, H*W)
    v = jnp.moveaxis(v.reshape(C, 4, H, W), 0, -1)   # (4, H, W, C)
    return ((1 - wx) * (1 - wy) * v[0] + wx * (1 - wy) * v[1]
            + (1 - wx) * wy * v[2] + wx * wy * v[3])


def _shift1d(img, f, axis, R):
    """1-D bilinear resample along ``axis`` by per-pixel offset ``f``
    (clipped to [-R, R]) as a sum of (2R+2) integer shifts."""
    f = jnp.clip(f, -float(R), float(R))
    f0 = jnp.floor(f)
    w = (f - f0)[..., None]
    acc = jnp.zeros_like(img)
    for d in range(-R, R + 2):
        # weight of shifted-by-d copy: (1-w) where f0==d, w where f0==d-1
        m = ((f0 == d) * 1.0)[..., None] * (1.0 - w) \
            + ((f0 == d - 1) * 1.0)[..., None] * w
        sh = jnp.roll(img, -d, axis=axis)
        acc = acc + m * sh
    return acc


def make_shift_sep(R):
    def warp(img, flow):
        out = _shift1d(img, flow[..., 0], 1, R)      # horizontal
        return _shift1d(out, flow[..., 1], 0, R)     # vertical
    return warp


def main():
    enable_compile_cache()
    H, W, C, B = 320, 480, 3, 8
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (B, H, W, C)), jnp.float32)
    flow = jnp.asarray(rng.uniform(-6, 6, (B, H, W, 2)), jnp.float32)

    variants = {
        "gather4 (current)": warp_gather4,
        "gather1 (stacked)": warp_gather1,
        "gather-1d (chan-major)": warp_gather1d,
        "shift-sep R=8": make_shift_sep(8),
        "shift-sep R=16": make_shift_sep(16),
    }

    ref = None
    print(f"platform={jax.default_backend()}  batch of {B} {H}x{W}x{C} "
          "warps, |flow|<=6", flush=True)
    for name, fn in variants.items():
        jf = jax.jit(lambda i, f: jax.vmap(fn)(i, f))
        out = jf(img, flow)
        err = (float(jnp.max(jnp.abs(out - ref))) if ref is not None
               else 0.0)
        if ref is None:
            ref = out
        # chain reps through a data dependency; hard-sync via scalar
        carry = jnp.sum(out) * 1e-20
        out = jf(img + carry, flow)
        carry = jnp.sum(out) * 1e-20
        float(carry)
        tic = time.perf_counter()
        for _ in range(20):
            out = jf(img + carry, flow)
            carry = jnp.sum(out) * 1e-20
        float(carry)
        ms = (time.perf_counter() - tic) / 20 * 1e3
        print(f"{name:<24s} {ms:8.3f} ms / {B} warps   "
              f"max|Δ| vs gather4 = {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
