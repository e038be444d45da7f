"""Time the full parity-layout inference generator (embedder + trunk +
mask fast paths) vs the standard flax generator at the rollout shapes
(segment-batch 7, 320x480, bf16), and check agreement on the same
folded params.  Sweeps RENDERLOOM_PACKED_LEVELS 1..3 (how many trunk
pyramid levels run parity-packed — fastpath.trunk_packed_levels).

RENDERLOOM_PALLAS_NORM=0/1 picks XLA vs fused-Pallas instance norms in
the fast path.

Run:  python scripts/fastgen_tpu.py    (serialize TPU jobs)
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

    from renderloom.core.config import RendererConfig
    from renderloom.models.fastpath import (FastInferenceGen,
                                            fold_fast_params)
    from renderloom.train.gan import (create_gan_state,
                                      fold_spectral_norm,
                                      make_inference_generator)

    on_tpu = jax.default_backend() == "tpu"
    dtype = "bfloat16" if on_tpu else "float32"
    rcfg = RendererConfig(compute_dtype=dtype)
    H, W = rcfg.data.model_height, rcfg.data.model_width

    gen = make_inference_generator(rcfg)
    fgen = FastInferenceGen(gen)
    _, _, _, r_state = create_gan_state(jax.random.PRNGKey(1), rcfg,
                                        height=H, width=W)
    folded = fold_spectral_norm(r_state.params_g, r_state.stats_g)
    ffolded = fold_fast_params(folded, rcfg.gen)

    rng = np.random.default_rng(0)
    f32 = jnp.float32
    label = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 22)), f32)
    back = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 3)), f32)
    prev = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 3)), f32)

    def run_std(p, l, b_, pv):
        return gen.apply({"params": p, "batch_stats": {}},
                         l, l, b_, pv, update_stats=False)

    jstd = jax.jit(run_std)
    i0, m0 = jstd(folded, label, back, prev)
    print(f"platform={jax.default_backend()}  B={B} {H}x{W} {dtype}  "
          f"pallas_norm={os.environ.get('RENDERLOOM_PALLAS_NORM', 'auto')}")

    def bench(jf, p):
        img, mask = jf(p, label, back, prev)
        carry = jnp.sum(img.astype(f32)) * 1e-20
        float(carry)
        tic = time.perf_counter()
        for _ in range(reps):
            img, mask = jf(p, label + carry, back, prev)
            carry = jnp.sum(img.astype(f32)) * 1e-20
        float(carry)
        return (time.perf_counter() - tic) / reps * 1e3

    ms_std = bench(jstd, folded)
    print(f"standard gen         {ms_std:8.2f} ms", flush=True)

    for pl in (1, 2, 3):
        os.environ["RENDERLOOM_PACKED_LEVELS"] = str(pl)
        ffolded = fold_fast_params(folded, rcfg.gen)

        def run_fast(p, l, b_, pv, _pl=pl):  # fresh fn → fresh trace
            return fgen.apply({"params": p, "batch_stats": {}},
                              l, l, b_, pv, update_stats=False)

        jfast = jax.jit(run_fast)
        i1, m1 = jfast(ffolded, label, back, prev)
        d_img = float(jnp.abs(i0.astype(f32) - i1.astype(f32)).max())
        d_msk = float(jnp.abs(m0.astype(f32) - m1.astype(f32)).max())
        ms_fast = bench(jfast, ffolded)
        print(f"fast gen (packed={pl}) {ms_fast:8.2f} ms   "
              f"({ms_std / ms_fast:.2f}x)  max|dimg|={d_img:.3e} "
              f"max|dmask|={d_msk:.3e}", flush=True)


if __name__ == "__main__":
    main()
