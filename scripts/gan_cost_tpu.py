"""GAN train-step cost analysis + batch scaling on the TPU.

Quantifies VERDICT r3 #1: XLA cost analysis (FLOP + HBM bytes per
step) of the restructured step, and wall-clock at batch 4/8/16 with
rematerialization on/off to find the throughput-optimal config.

Run: python scripts/gan_cost_tpu.py [reps]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(reps: int = 4,
         configs=((4, False), (8, False), (8, True), (16, True))):
    from renderloom.core.cache import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from renderloom.core.config import RendererConfig
    from renderloom.models.perceptual import PerceptualLoss
    from renderloom.parallel import make_mesh, replicate, shard_batch
    from renderloom.train.gan import create_gan_state, make_gan_train_step

    on_tpu = jax.default_backend() == "tpu"
    results = []
    mesh = make_mesh()
    rng = np.random.default_rng(0)

    for B, remat in configs:
        cfg = RendererConfig(
            compute_dtype="bfloat16" if on_tpu else "float32",
            batch_size=B)
        cfg = dataclasses.replace(
            cfg, gen=dataclasses.replace(cfg.gen, do_checkpoint=remat))
        H, W = cfg.data.model_height, cfg.data.model_width
        L = cfg.data.max_frames
        gen, dis, txs, state = create_gan_state(jax.random.PRNGKey(0),
                                                cfg, height=H, width=W)
        state = replicate(mesh, state)
        step = make_gan_train_step(
            gen, dis, txs, cfg,
            PerceptualLoss(compute_dtype=cfg.compute_dtype))
        batch = shard_batch(mesh, {
            "label": rng.uniform(-1, 1, (B, L, H, W, 22)).astype(
                np.float32),
            "image": rng.uniform(-1, 1, (B, L, H, W, 3)).astype(
                np.float32),
            "back": rng.uniform(-1, 1, (B, L, H, W, 3)).astype(
                np.float32),
            "fg_mask": (rng.uniform(0, 1, (B, L, H, W, 1)) > 0.5
                        ).astype(np.float32),
        })

        # cost analysis from the compiled executable.  Retry once: the
        # round-3 B=16 row died on a transient remote-compiler 500 and
        # was never resolved (VERDICT r3 #6) — with the persistent
        # compile cache a second attempt is nearly free.
        tflop = gb = float("nan")
        for attempt in range(2):
            try:
                lowered = step.lower(state, batch)
                compiled = lowered.compile()
                ca = compiled.cost_analysis()
                ca = ca[0] if isinstance(ca, (list, tuple)) else ca
                tflop = ca.get("flops", 0.0) / 1e12
                gb = ca.get("bytes accessed", 0.0) / 1e9
                break
            except Exception as e:  # cost analysis is best-effort
                print(f"cost_analysis attempt {attempt}: "
                      f"{type(e).__name__}: {str(e)[:300]}", flush=True)
                time.sleep(20)

        sec = wps = float("nan")
        for attempt in range(2):
            try:
                state, metrics = step(state, batch)
                float(metrics["g/total"])
                tic = time.perf_counter()
                for _ in range(reps):
                    state, metrics = step(state, batch)
                float(metrics["g/total"])
                sec = (time.perf_counter() - tic) / reps
                wps = B / sec
                break
            except Exception as e:   # OOM / transient compiler error
                print(f"B={B} remat={remat} attempt {attempt}: "
                      f"{type(e).__name__}: {str(e)[:300]}", flush=True)
                if "RESOURCE_EXHAUSTED" in str(e):
                    break             # OOM is deterministic — record it
                time.sleep(20)

        row = {"batch": B, "remat": remat, "tflop_per_step": round(tflop, 2),
               "hbm_gb_per_step": round(gb, 1),
               "sec_per_step": round(sec, 3) if sec == sec else None,
               "windows_per_sec": round(wps, 2) if wps == wps else None}
        if sec == sec:
            row["gbps"] = round(gb / sec, 0)
            row["tflops"] = round(tflop / sec, 1)
        results.append(row)
        print(json.dumps(row))
        del state, batch, step

    with open("/tmp/gan_cost.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    # usage: gan_cost_tpu.py [reps] [B:remat ...]   e.g.  4 12:0 12:1 16:1
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    if len(sys.argv) > 2:
        cfgs = tuple((int(a.split(":")[0]), bool(int(a.split(":")[1])))
                     for a in sys.argv[2:])
        main(reps, cfgs)
    else:
        main(reps)
