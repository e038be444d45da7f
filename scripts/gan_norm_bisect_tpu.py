"""Bisect the r3->r4 GAN train-step regression over the instance-norm
implementation (RENDERLOOM_NORM_IMPL), holding everything else at HEAD.

Control experiment (BASELINE.md round-4 queue): the exact round-3
commit re-ran at 7.104 windows/s (B=4) the same day HEAD read 5.63, so
~21% is a renderloom regression in the r3->r4 diff.  gan_cost_tpu.py
feeds random batches straight into make_gan_train_step (no rasterizer,
no prepare_batch), so the regression lives inside the step — and the
only r3->r4 change inside the step closure is layers.instance_norm
(270eaa4 two-pass, then e4d47af shifted one-pass).  This script times
the identical step under each implementation:

  onepass  — r3 body (the 7.1 w/s baseline, ADVICE-r3 stability risk)
  twopass  — 270eaa4 advisor fix (the 5.83 w/s capture)
  shifted  — e4d47af (the 5.62 w/s capture; autodiff saves a full fp32
             centered residual per norm)
  vjp      — round-5 fix: custom VJP, residuals = x + per-(B,C)
             scalars (hand backward reads x and dy only)

Run: python scripts/gan_norm_bisect_tpu.py [reps] [batches…]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(reps: int = 5, batches=(4,)):
    from renderloom.core.cache import enable_compile_cache
    enable_compile_cache()

    import jax

    from renderloom.core.config import RendererConfig
    from renderloom.models.perceptual import PerceptualLoss
    from renderloom.parallel import make_mesh, replicate, shard_batch
    from renderloom.train.gan import create_gan_state, make_gan_train_step

    on_tpu = jax.default_backend() == "tpu"
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    results = []

    for B in batches:
        cfg = RendererConfig(
            compute_dtype="bfloat16" if on_tpu else "float32",
            batch_size=B)
        H, W = cfg.data.model_height, cfg.data.model_width
        L = cfg.data.max_frames
        batch_np = {
            "label": rng.uniform(-1, 1, (B, L, H, W, 22)).astype(
                np.float32),
            "image": rng.uniform(-1, 1, (B, L, H, W, 3)).astype(
                np.float32),
            "back": rng.uniform(-1, 1, (B, L, H, W, 3)).astype(
                np.float32),
            "fg_mask": (rng.uniform(0, 1, (B, L, H, W, 1)) > 0.5
                        ).astype(np.float32),
        }

        for impl in ("vjp", "onepass", "shifted", "twopass"):
            os.environ["RENDERLOOM_NORM_IMPL"] = impl
            try:
                gen, dis, txs, state = create_gan_state(
                    jax.random.PRNGKey(0), cfg, height=H, width=W)
                state = replicate(mesh, state)
                step = make_gan_train_step(
                    gen, dis, txs, cfg,
                    PerceptualLoss(compute_dtype=cfg.compute_dtype))
                batch = shard_batch(mesh, batch_np)

                gb = float("nan")
                try:
                    ca = step.lower(state, batch).compile(
                        ).cost_analysis()
                    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
                    gb = ca.get("bytes accessed", 0.0) / 1e9
                except Exception as e:
                    print(f"cost_analysis {impl}: "
                          f"{type(e).__name__}: {str(e)[:200]}",
                          flush=True)

                state, metrics = step(state, batch)
                float(metrics["g/total"])          # hard sync
                tic = time.perf_counter()
                for _ in range(reps):
                    state, metrics = step(state, batch)
                float(metrics["g/total"])          # hard sync
                sec = (time.perf_counter() - tic) / reps
                row = {"impl": impl, "batch": B,
                       "hbm_gb_per_step": round(gb, 1),
                       "sec_per_step": round(sec, 3),
                       "windows_per_sec": round(B / sec, 2)}
                del state, step, batch
            except Exception as e:
                row = {"impl": impl, "batch": B,
                       "error": f"{type(e).__name__}: {str(e)[:200]}"}
            finally:
                del os.environ["RENDERLOOM_NORM_IMPL"]
            results.append(row)
            print(json.dumps(row), flush=True)

    with open("/tmp/gan_norm_bisect.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    batches = tuple(int(a) for a in sys.argv[2:]) or (4,)
    main(reps, batches)
