"""Fused Pallas instance-norm (+affine +leaky) for TPU inference.

The mask-net bisect (scripts/norm_micro_tpu.py, BASELINE.md round 3)
shows XLA's instance norm runs far off the HBM roofline at the render
shapes: the fp32 cast materializes, the two reductions and the
normalize run as separate kernels, and low-channel NHWC layouts leave
most of the 128 lanes idle.  This kernel does the whole thing in two
sweeps over (B, H·W, C) tiles held in VMEM:

  pass 0 — accumulate per-(B, C) Σx and Σx² in a float32 scratch;
  pass 1 — mean/rsqrt once, then normalize + affine + leaky per tile.

Bytes ≈ 2 reads + 1 write of x — the bandwidth floor for a global
normalization.  ``parity=True`` averages moments over 4 equal-count
parity groups (channels packed (p·2+q)·C+c), the exact full-resolution
statistics for space-to-depth tensors (renderloom/models/fastpath.py).

Semantics match ``layers.instance_norm`` / ``fastpath.instance_norm_p4``
to float tolerance (tests/test_norm_pallas.py).  Inference-only: no
custom VJP — training keeps the XLA path.  Falls back to interpret mode
off-TPU.

Reference provenance: torch ``InstanceNorm2d`` as used throughout the
reference's conv blocks (imaginaire activation_norm.py:399-402).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, s_ref, b_ref, out_ref, acc_ref, *, n_px: int,
            eps: float, slope: Optional[float], parity: bool,
            affine: bool, interpret: bool):
    p = pl.program_id(1)
    t = pl.program_id(2)

    @pl.when((p == 0) & (t == 0))
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[0].astype(jnp.float32)               # (T, C)

    @pl.when(p == 0)
    def _accumulate():
        acc_ref[0:1, :] += jnp.sum(x, axis=0, keepdims=True)
        acc_ref[1:2, :] += jnp.sum(x * x, axis=0, keepdims=True)

    @pl.when(p == 1)
    def _normalize():
        inv_n = 1.0 / n_px
        m1 = acc_ref[0:1, :] * inv_n               # (1, C)
        m2 = acc_ref[1:2, :] * inv_n
        if parity:
            # average the four parity groups (lanes are (p·2+q)·C + c).
            # Lane rotations by multiples of C leave every lane holding
            # its channel's cross-parity sum — Mosaic supports rotates,
            # while reshaping lanes into sublanes ((1,4C)→(1,4,C)) is an
            # unsupported shape cast on real TPUs.
            C = m1.shape[1] // 4

            def pavg(m):
                # interpret uses jnp.roll — IDENTICAL algebra to the
                # compiled pltpu.roll (summing rotations by C, 2C, 3C
                # is direction-independent mod 4C), so the CPU suite
                # exercises the same rotation form that ships (ADVICE
                # r4: the old reshape/tile branch left a roll-offset
                # bug invisible off-hardware)
                roll = jnp.roll if interpret else pltpu.roll
                s = m
                for k in (1, 2, 3):
                    s = s + roll(m, k * C, 1)
                return s * 0.25

            m1 = pavg(m1)
            m2 = pavg(m2)
        var = jnp.maximum(m2 - m1 * m1, 0.0)
        y = (x - m1) * jax.lax.rsqrt(var + eps)
        if affine:
            y = y * s_ref[...] + b_ref[...]
        if slope is not None:
            y = jnp.where(y >= 0, y, y * slope)
        out_ref[0] = y.astype(out_ref.dtype)


def _pick_tile(n: int, align: int, cap: int = 4096) -> int:
    """Largest sublane-aligned tile dividing n, or 0 if none.  ``align``
    is the dtype's sublane multiple: 8 for 4-byte, 16 for 2-byte dtypes
    (Mosaic packs two bf16 rows per 32-bit sublane — an ×8-but-not-×16
    bf16 tile can fail to compile)."""
    start = min(cap, n) // align * align
    for t in range(start, 0, -align):
        if n % t == 0:
            return t
    return 0


def _vmem_tile_cap(C: int, align: int) -> int:
    """Tile cap keeping the kernel's scoped-VMEM stack under budget.

    Hardware-measured rate: the f32 path costs ~15.1 bytes of kernel
    stack per (tile × C) element (double-buffered in/out blocks + the
    f32 temporaries) — 18.55 MB at tile=2400, C=512 against the 16 MB
    scoped-VMEM limit, the queue-5b serving crash at clips≥2.  Budget
    12 MB at 16 B/elem (conservative for bf16, whose blocks halve),
    floor one sublane group so tiny-C shapes keep the 4096 cap."""
    return max(align, (12 * 2**20) // (16 * C) // align * align)


def instance_norm_fused(x: jax.Array, scale: Optional[jax.Array] = None,
                        bias: Optional[jax.Array] = None, *,
                        parity: bool = False,
                        slope: Optional[float] = None,
                        eps: float = 1e-5,
                        interpret: bool = False) -> jax.Array:
    """Instance norm over (B, H, W, C) NHWC with optional per-channel
    affine and fused leaky — one Pallas program, two passes over x.

    ``parity=True``: x is a space-to-depth tensor; statistics are the
    exact full-resolution per-channel moments (averaged over the four
    parity groups); ``scale``/``bias`` are already parity-tiled (4C,).
    Returns x's dtype.  Raises ValueError if H·W has no usable tile —
    callers fall back to the XLA path.
    """
    B, H, W, C = x.shape
    n_px = H * W
    align = 16 if jnp.dtype(x.dtype).itemsize == 2 else 8
    tile = _pick_tile(n_px, align, min(4096, _vmem_tile_cap(C, align)))
    if tile == 0:
        raise ValueError(f"no tile for H*W={n_px}")
    from renderloom.ops import target_is_tpu
    interpret = interpret or not target_is_tpu()
    affine = scale is not None
    if scale is None:
        scale = jnp.ones((C,), jnp.float32)
    if bias is None:
        bias = jnp.zeros((C,), jnp.float32)

    xf = x.reshape(B, n_px, C)
    grid = (B, 2, n_px // tile)
    kernel = functools.partial(_kernel, n_px=n_px, eps=eps, slope=slope,
                               parity=parity, affine=affine,
                               interpret=interpret)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, C), lambda b, p, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, p, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, p, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # pass 0 parks the (unwritten) output block at t=0; pass 1
        # revisits it with real data before any flush
        out_specs=pl.BlockSpec((1, tile, C), lambda b, p, t: (b, p * t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_px, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((2, C), jnp.float32)],
        interpret=interpret,
    )(xf, scale.reshape(1, C).astype(jnp.float32),
      bias.reshape(1, C).astype(jnp.float32))
    return out.reshape(B, H, W, C)
