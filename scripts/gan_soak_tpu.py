"""GAN stability soak on real TPU (VERDICT round-1 item 7).

Runs a few hundred full-scale renderer GAN train steps (batch 4,
480x320, per-frame D/G updates, bfloat16 compute) on synthetic windows
and records loss curves, non-finite-gradient counters and spectral-norm
u-vector drift — the stability evidence SURVEY.md §7.2 called the main
schedule risk.  Results land in BASELINE.md.

Run: python scripts/gan_soak_tpu.py [steps]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from renderloom.core.cache import enable_compile_cache


def main(steps: int = 300):
    enable_compile_cache()
    assert jax.default_backend() == "tpu", jax.devices()

    from renderloom.core.config import RendererConfig
    from renderloom.models.perceptual import PerceptualLoss
    from renderloom.train.gan import create_gan_state, make_gan_train_step

    cfg = RendererConfig(compute_dtype="bfloat16")
    H, W = cfg.data.model_height, cfg.data.model_width
    gen, dis, txs, state = create_gan_state(jax.random.PRNGKey(0), cfg,
                                            height=H, width=W)
    step = make_gan_train_step(
        gen, dis, txs, cfg,
        PerceptualLoss(compute_dtype=cfg.compute_dtype))
    u0 = jax.device_get(state.stats_g)

    B, L = cfg.batch_size, cfg.data.max_frames
    rng = np.random.default_rng(0)

    def make_batch():
        # structured synthetic windows: smooth background + moving
        # square "human" + matching labels/fg (not pure noise, so the
        # adversarial game has signal)
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        label = np.zeros((B, L, H, W, 22), np.float32)
        image = np.zeros((B, L, H, W, 3), np.float32)
        fg = np.zeros((B, L, H, W, 1), np.float32)
        for b in range(B):
            phase = rng.uniform(0, 2)
            back = np.stack([np.sin(xx / 60 + phase),
                             np.cos(yy / 40 + phase),
                             xx / W * 2 - 1], -1) * 0.5
            for i in range(L):
                cx = int(rng.uniform(60, W - 60))
                cy = int(rng.uniform(60, H - 60))
                img = back.copy()
                img[cy - 20:cy + 20, cx - 10:cx + 10] = \
                    rng.uniform(-1, 1, 3)
                image[b, i] = img
                fg[b, i, cy - 20:cy + 20, cx - 10:cx + 10] = 1.0
                blob = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / 200)
                label[b, i, :, :, rng.integers(0, 22)] = blob * 2 - 1
        back_imgs = image.copy()
        back_imgs[:, :, :, :, :] = np.where(fg > 0.5, 0.0, image)
        return {"label": label, "image": image, "back": back_imgs,
                "fg_mask": fg}

    batches = [jax.device_put(make_batch()) for _ in range(4)]
    hist = []
    tic = time.perf_counter()
    for i in range(steps):
        state, metrics = step(jax.tree.map(lambda x: x, state)
                              if i == 0 else state, batches[i % 4])
        if (i + 1) % 25 == 0 or i == 0:
            m = {k: float(v) for k, v in metrics.items()}
            u1 = jax.device_get(state.stats_g)
            drift = float(np.mean([
                np.abs(a - b).mean() for a, b in
                zip(jax.tree.leaves(u0), jax.tree.leaves(u1))]))
            m.update(step=i + 1, u_drift=drift,
                     wall_s=round(time.perf_counter() - tic, 1))
            hist.append(m)
            print(json.dumps({k: (round(v, 4) if isinstance(v, float)
                                  else v) for k, v in m.items()}))
    final = hist[-1]
    ok = (final.get("notfinite/g", 0) == 0
          and final.get("notfinite/d", 0) == 0
          and np.isfinite(final["g/total"]))
    print(json.dumps({"soak_ok": bool(ok), "steps": steps,
                      "steps_per_sec": round(steps / (
                          time.perf_counter() - tic), 3)}))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 300)
