"""Bisect the rollout stage's per-step cost on the TPU: the segment
rollout runs 3 sequential generator calls at segment-batch 7 (~73
ms/call, 73% of the e2e pipeline — BASELINE.md round 3).  This times
the generator's components separately at the same shapes to find
where the milliseconds live:

  full      — Generator.apply (embedder + SPADE trunk + mask net)
  embedder  — LabelEmbedder pyramid over cat(back, prev) (6ch)
  mask      — MaskGenerator (label 22ch | imgs 9ch dual encoder)
  trunk     ≈ full − embedder − mask (they share no compute)

Run:  python scripts/rollout_bisect_tpu.py    (serialize TPU jobs)
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
    from renderloom.models.renderer import (Generator, LabelEmbedder,
                                            MaskGenerator)
    from renderloom.train.gan import (create_gan_state,
                                      fold_spectral_norm,
                                      make_inference_generator)

    on_tpu = jax.default_backend() == "tpu"
    dtype = "bfloat16" if on_tpu else "float32"
    rcfg = RendererConfig(compute_dtype=dtype)
    H, W = rcfg.data.model_height, rcfg.data.model_width

    gen = make_inference_generator(rcfg)
    _, _, _, r_state = create_gan_state(jax.random.PRNGKey(1), rcfg,
                                        height=H, width=W)
    params = fold_spectral_norm(r_state.params_g, r_state.stats_g)

    rng = np.random.default_rng(0)
    f32 = jnp.float32
    label = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 22)), f32)
    back = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 3)), f32)
    prev = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 3)), f32)

    cdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    # spectral-norm-free variants (params are folded; no batch_stats)
    embedder = LabelEmbedder(gen.cfg, cdt)
    masker = MaskGenerator(gen.cfg, cdt)

    def t_full(l, b_, p):
        img, mask = gen.apply({"params": params, "batch_stats": {}},
                              l, l, b_, p, update_stats=False)
        return jnp.sum(img.astype(f32)) * 1e-20

    def t_embed(l, b_, p):
        del l
        outs = embedder.apply({"params": params["ref_embed"]},
                              jnp.concatenate([b_, p], axis=-1))
        return sum(jnp.sum(o.astype(f32)) for o in outs) * 1e-20

    def t_mask(l, b_, p):
        imgs = jnp.concatenate([p, b_, p], axis=-1)
        m = masker.apply({"params": params["mask_net"]},
                         l.astype(cdt), imgs.astype(cdt))
        return jnp.sum(m.astype(f32)) * 1e-20

    print(f"platform={jax.default_backend()}  B={B} {H}x{W}", flush=True)
    times = {}
    for name, fn in (("full generator", t_full),
                     ("label embedder", t_embed),
                     ("mask net", t_mask)):
        jf = jax.jit(fn)
        carry = jf(label, back, prev)
        carry = jf(label + carry, back, prev)
        float(carry)
        tic = time.perf_counter()
        for _ in range(reps):
            carry = jf(label + carry, back, prev)
        float(carry)
        ms = (time.perf_counter() - tic) / reps * 1e3
        times[name] = ms
        print(f"{name:<16s} {ms:8.2f} ms", flush=True)
    trunk = times["full generator"] - times["label embedder"] \
        - times["mask net"]
    print(f"{'trunk (approx)':<16s} {trunk:8.2f} ms")


if __name__ == "__main__":
    main()
