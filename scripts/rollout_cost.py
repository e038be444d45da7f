"""XLA cost analysis of the inference segment-rollout program (the
73%-of-e2e stage per BASELINE.md round 3) — FLOPs + HBM bytes so the
optimization target is a roofline fact, not a guess.

CPU-lowerable (cost analysis is platform-independent enough for
flops/bytes accounting): run anywhere, no TPU needed.

  python scripts/rollout_cost.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main(rate: int = 4, keyframes: int = 8):
    from renderloom.core.config import RendererConfig
    from renderloom.train.gan import (create_gan_state,
                                      fold_spectral_norm,
                                      make_inference_generator,
                                      make_segment_rollout)

    rcfg = RendererConfig(compute_dtype="bfloat16")
    H, W = rcfg.data.model_height, rcfg.data.model_width
    K = keyframes
    L = (K - 1) * rate + 1

    gen, _, _, r_state = create_gan_state(jax.random.PRNGKey(1), rcfg,
                                          height=H, width=W)
    folded_g = fold_spectral_norm(r_state.params_g, r_state.stats_g)
    rollout = make_segment_rollout(make_inference_generator(rcfg), rcfg,
                                   rate)

    rng = np.random.default_rng(0)
    batch = {
        "label": jnp.asarray(rng.uniform(0, 1, (1, L, H, W, 22)),
                             jnp.bfloat16),
        "back": jnp.asarray(rng.uniform(0, 1, (1, L, H, W, 3)),
                            jnp.float32),
        "key_img": jnp.asarray(rng.uniform(0, 1, (1, L, H, W, 3)),
                               jnp.float32),
        "is_key": jnp.asarray(np.arange(L) % rate == 0),
    }

    lowered = jax.jit(lambda g, b: rollout(g, {}, b)).lower(folded_g,
                                                            batch)
    cost = lowered.compile().cost_analysis()
    flops = cost.get("flops", 0.0)
    bytes_ = cost.get("bytes accessed", 0.0)
    print(f"rollout {H}x{W} rate={rate} K={K} -> {L} frames")
    print(f"flops/clip       : {flops / 1e12:.3f} TFLOP "
          f"({flops / L / 1e9:.2f} GFLOP/frame)")
    print(f"HBM bytes/clip   : {bytes_ / 1e9:.2f} GB "
          f"({bytes_ / L / 1e6:.1f} MB/frame)")
    ms = 220.0  # measured rollout stage, BASELINE round 3
    print(f"at measured {ms:.0f} ms/clip: "
          f"{flops / (ms / 1e3) / 1e12:.1f} TFLOP/s "
          f"({flops / (ms / 1e3) / 197e12 * 100:.1f}% of v5e bf16 peak), "
          f"{bytes_ / (ms / 1e3) / 1e9:.0f} GB/s "
          f"({bytes_ / (ms / 1e3) / 819e9 * 100:.0f}% of v5e HBM)")


if __name__ == "__main__":
    main()
