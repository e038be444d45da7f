"""Full-scale TPU learning demo (the reference's own success criterion).

Builds a small structured synthetic HumanSlomo.h5 at the reference
resolution (480x320): textured panning background + an articulated
"person" drawn from the pose skeleton, with warped-background DAIN
frames that LACK the person.  Trains the full renderer GAN for a few
hundred steps and runs the reference eval protocol
(``evaluate_h5``, rate-2 rollout, fg-masked PSNR/SSIM) — success is
``OURS_PSNR > DAIN_PSNR``: rendering beats pure background warping
(Pose_Guided_Neural_Rendering/models/evaluator.py:116-140).

Run on the TPU host: python scripts/train_eval_tpu_demo.py [steps]
"""
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

H, W = 320, 480
N_TRAIN, N_TEST = 48, 17


def _pose(t):
    """19-joint walking-ish skeleton in image coords."""
    cx = 120 + (W - 240) * t
    cy = 150.0
    sway = 12 * np.sin(t * 12 * np.pi)
    j = np.zeros((19, 3), np.float32)
    pts = {
        0: (cx, cy - 78), 1: (cx, cy - 55), 2: (cx - 22, cy - 55),
        3: (cx - 30, cy - 25), 4: (cx - 32 + sway / 2, cy + 2),
        5: (cx + 22, cy - 55), 6: (cx + 30, cy - 25),
        7: (cx + 32 - sway / 2, cy + 2), 8: (cx, cy),
        9: (cx - 12, cy), 10: (cx - 14 + sway, cy + 40),
        11: (cx - 15 + sway, cy + 80), 12: (cx + 12, cy),
        13: (cx + 14 - sway, cy + 40), 14: (cx + 15 - sway, cy + 80),
        15: (cx - 15 + sway, cy + 88), 16: (cx + 15 - sway, cy + 88),
        17: (cx - 34 + sway / 2, cy + 8), 18: (cx + 34 - sway / 2, cy + 8),
    }
    for k, (x, y) in pts.items():
        j[k] = (x, y, 0.95)
    return j


def _scene(rng):
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = np.zeros((H, W, 3), np.float32)
    for _ in range(60):
        cx, cy = rng.uniform(-50, W + 50), rng.uniform(-50, H + 50)
        s = rng.uniform(6, 30)
        a = rng.uniform(0, 0.5, 3)
        img += np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2)
                      / (2 * s * s))[..., None] * a
    img = img / max(img.max(), 1e-6)
    return (img * 255).astype(np.float32)


def _draw_person(img, pose):
    """Capsule limbs + joint dots, distinct colors."""
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (1, 5), (5, 6), (6, 7),
             (1, 8), (8, 9), (9, 10), (10, 11), (8, 12), (12, 13),
             (13, 14), (11, 15), (14, 16), (4, 17), (7, 18)]
    out = img.copy()
    rngc = np.random.default_rng(5)
    for a, b in edges:
        ax, ay = pose[a, 0], pose[a, 1]
        bx, by = pose[b, 0], pose[b, 1]
        px, py = xx - ax, yy - ay
        dx, dy = bx - ax, by - ay
        L2 = dx * dx + dy * dy + 1e-6
        tt = np.clip((px * dx + py * dy) / L2, 0, 1)
        d2 = (px - tt * dx) ** 2 + (py - tt * dy) ** 2
        m = d2 < 7 ** 2
        color = rngc.uniform(40, 255, 3)
        out[m] = color
    return out


def _png(arr):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr.astype(np.uint8)).save(buf, format="PNG")
    return np.frombuffer(buf.getvalue(), dtype=np.uint8)


def build_h5(path):
    import h5py

    rng = np.random.default_rng(0)
    with h5py.File(path, "w") as f:
        for vid, n, prefix in (("clip_a", N_TRAIN, "train"),
                               ("clip_b", N_TRAIN, "train"),
                               ("test_a", N_TEST, "gt")):
            scene = _scene(rng)
            grp = f.create_group(vid)
            dt = h5py.special_dtype(vlen=np.uint8)
            imgs = grp.create_dataset(f"{prefix}_images", (n,), dtype=dt)
            dains = grp.create_dataset(f"{prefix}_dain", (n,), dtype=dt)
            poses = np.zeros((n, 19, 3), np.float64)
            for i in range(n):
                t = i / (n - 1)
                shift = int(8 * t)
                back = np.roll(scene, shift, axis=1)
                pose = _pose(t)
                poses[i] = pose
                imgs[i] = _png(_draw_person(back, pose))
                # DAIN background: slightly blurred/rolled, NO person
                dains[i] = _png(np.roll(back, 1, axis=1))
            grp.create_dataset(f"{prefix}_poses", data=poses)
    return path


def main(steps=500):
    from renderloom.core.cache import enable_compile_cache
    enable_compile_cache()
    import jax

    assert jax.default_backend() == "tpu", jax.devices()
    import dataclasses

    from renderloom.core.config import RendererConfig
    from renderloom.data.hsm import HsmReader
    from renderloom.data.prefetch import prefetch
    from renderloom.eval.render_eval import evaluate_h5
    from renderloom.models.perceptual import PerceptualLoss
    from renderloom.train.gan import create_gan_state, make_gan_train_step

    h5 = build_h5("/tmp/demo_hsm.h5")
    print("h5 built")
    cfg = RendererConfig(compute_dtype="bfloat16")
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, train_video_list=["clip_a", "clip_b"],
        test_video_list=["test_a"]))
    d = cfg.data
    reader = HsmReader(h5, d.train_video_list, "train", d.max_frames)
    test_reader = HsmReader(h5, d.test_video_list, "test", d.max_frames)

    gen, dis, txs, state = create_gan_state(jax.random.PRNGKey(0), cfg)
    step = make_gan_train_step(
        gen, dis, txs, cfg, PerceptualLoss(compute_dtype="bfloat16"),
        data_cfg=d, fused_raster=True)

    rng = np.random.default_rng(0)
    n = 0
    tic = time.perf_counter()
    while n < steps:
        for batch in prefetch(reader.batches(rng, cfg.batch_size),
                              depth=2):
            state, metrics = step(state, batch)
            n += 1
            if n % 50 == 0:
                print(json.dumps({
                    "step": n,
                    "g_total": round(float(metrics["g/total"]), 3),
                    "d_total": round(float(metrics["d/total"]), 3),
                    "notfinite_g": float(metrics["notfinite/g"]),
                    "wall_s": round(time.perf_counter() - tic, 1)}),
                    flush=True)
            if n >= steps:
                break

    host_state = jax.device_get(state)
    results = evaluate_h5(gen, host_state, cfg, test_reader,
                          max_keyframes=8)
    results = {k: round(v, 3) for k, v in results.items()}
    results["beats_dain"] = bool(
        results["OURS_PSNR"] > results["DAIN_PSNR"])
    print(json.dumps(results))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 500)
