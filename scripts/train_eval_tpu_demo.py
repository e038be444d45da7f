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


def _pose(t, scale=1.0, cy0=150.0, sway_amp=12.0):
    """19-joint walking-ish skeleton in image coords.  ``scale``/
    ``cy0``/``sway_amp`` parameterize the subject (limb length, height
    in frame, gait) so each clip carries a distinct body."""
    cx = 120 + (W - 240) * t
    cy = cy0
    s = scale
    sway = sway_amp * np.sin(t * 12 * np.pi)
    j = np.zeros((19, 3), np.float32)
    pts = {
        0: (cx, cy - 78 * s), 1: (cx, cy - 55 * s),
        2: (cx - 22 * s, cy - 55 * s),
        3: (cx - 30 * s, cy - 25 * s),
        4: (cx - 32 * s + sway / 2, cy + 2 * s),
        5: (cx + 22 * s, cy - 55 * s), 6: (cx + 30 * s, cy - 25 * s),
        7: (cx + 32 * s - sway / 2, cy + 2 * s), 8: (cx, cy),
        9: (cx - 12 * s, cy), 10: (cx - 14 * s + sway, cy + 40 * s),
        11: (cx - 15 * s + sway, cy + 80 * s), 12: (cx + 12 * s, cy),
        13: (cx + 14 * s - sway, cy + 40 * s),
        14: (cx + 15 * s - sway, cy + 80 * s),
        15: (cx - 15 * s + sway, cy + 88 * s),
        16: (cx + 15 * s - sway, cy + 88 * s),
        17: (cx - 34 * s + sway / 2, cy + 8 * s),
        18: (cx + 34 * s - sway / 2, cy + 8 * s),
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


def _draw_person(img, pose, color_seed=5, limb_r=7.0):
    """Capsule limbs + joint dots, distinct colors.  ``color_seed``
    picks the subject's clothing palette, ``limb_r`` their build."""
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (1, 5), (5, 6), (6, 7),
             (1, 8), (8, 9), (9, 10), (10, 11), (8, 12), (12, 13),
             (13, 14), (11, 15), (14, 16), (4, 17), (7, 18)]
    out = img.copy()
    rngc = np.random.default_rng(color_seed)
    for a, b in edges:
        ax, ay = pose[a, 0], pose[a, 1]
        bx, by = pose[b, 0], pose[b, 1]
        px, py = xx - ax, yy - ay
        dx, dy = bx - ax, by - ay
        L2 = dx * dx + dy * dy + 1e-6
        tt = np.clip((px * dx + py * dy) / L2, 0, 1)
        d2 = (px - tt * dx) ** 2 + (py - tt * dy) ** 2
        m = d2 < limb_r ** 2
        color = rngc.uniform(40, 255, 3)
        out[m] = color
    return out


# per-clip subject specs: (pose scale, center y, sway, palette, build).
# test_a is a HELD-OUT subject — the pose head never sees its body
# proportions or clothing during training
SUBJECTS = {
    "clip_a": (1.0, 150.0, 12.0, 5, 7.0),
    "clip_b": (0.8, 130.0, 16.0, 11, 5.5),
    "clip_c": (1.2, 170.0, 8.0, 23, 8.5),
    "clip_d": (0.9, 200.0, 20.0, 37, 6.0),
    "test_a": (1.1, 160.0, 10.0, 47, 7.5),
}


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
                               ("clip_c", N_TRAIN, "train"),
                               ("clip_d", N_TRAIN, "train"),
                               ("test_a", N_TEST, "gt")):
            scene = _scene(rng)
            grp = f.create_group(vid)
            dt = h5py.special_dtype(vlen=np.uint8)
            imgs = grp.create_dataset(f"{prefix}_images", (n,), dtype=dt)
            dains = grp.create_dataset(f"{prefix}_dain", (n,), dtype=dt)
            poses = np.zeros((n, 19, 3), np.float64)
            scale, cy0, sway, cseed, limb_r = SUBJECTS[vid]
            for i in range(n):
                t = i / (n - 1)
                shift = int(8 * t)
                back = np.roll(scene, shift, axis=1)
                pose = _pose(t, scale, cy0, sway)
                poses[i] = pose
                imgs[i] = _png(_draw_person(back, pose, cseed, limb_r))
                # DAIN background: slightly blurred/rolled, NO person
                dains[i] = _png(np.roll(back, 1, axis=1))
            grp.create_dataset(f"{prefix}_poses", data=poses)
    return path


def main(steps=500, ssim_w=0.0, resume_from=0, grad_w=0.0,
         curriculum=True):
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
    # ssim_w: the demo's perceptual loss runs on RANDOM VGG features
    # (no VGG19_NPZ snapshot in this environment), which won PSNR but
    # lost fg-masked SSIM to the warped-background baseline (round-4:
    # OURS_SSIM 0.906 vs DAIN 0.927) — the optional 1−SSIM term targets
    # the evaluator's own metric directly.  Measured: w=8.0 at 3000
    # steps DESTABILIZED the GAN (PSNR 21.41→17.63, SSIM unchanged —
    # /tmp/q5b_gan_demo.log); pass a small weight (≤2) instead.  Off
    # (0.0) at reference parity.
    # grad_w: fg-masked image-gradient L1 — the round-5 alternative
    # after the direct SSIM term measured negative at w=8 AND w=2
    # (BASELINE.md round-5 GAN-demo table): matches GT's local contrast
    # while suppressing the hallucinated texture noise SSIM punishes.
    cfg = RendererConfig(compute_dtype="bfloat16", ssim_w=ssim_w,
                         grad_w=grad_w)
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, train_video_list=["clip_a", "clip_b", "clip_c",
                                    "clip_d"],
        test_video_list=["test_a"]))
    d = cfg.data
    reader = HsmReader(h5, d.train_video_list, "train", d.max_frames)
    test_reader = HsmReader(h5, d.test_video_list, "test", d.max_frames)

    gen, dis, txs, state = create_gan_state(jax.random.PRNGKey(0), cfg)
    step = make_gan_train_step(
        gen, dis, txs, cfg, PerceptualLoss(compute_dtype="bfloat16"),
        data_cfg=d, fused_raster=True)

    # mid-run checkpoint/resume (VERDICT r3 #5: long-run stability):
    # at steps/2 the state is orbax-saved, dropped, restored into a
    # fresh skeleton and training continues from the restored pytree
    from renderloom.core import checkpoint as ckpt
    ckpt_dir = "/tmp/demo_gan_ckpt"
    resume_at = max(steps // 2, 1)
    resumed = False
    n = 0
    if resume_from:
        # continue a killed run from its mid-run orbax checkpoint
        # (pass the step explicitly — the dir may hold checkpoints
        # from other demo configs)
        skeleton = jax.device_get(state)
        state = jax.device_put(ckpt.restore_checkpoint(
            ckpt_dir, step=resume_from, target=skeleton))
        n = resume_from
        resumed = True
        print(json.dumps({"resumed_from": n}), flush=True)

    # curriculum (reference train.py:109-110): the training window
    # grows by one frame per update_frame_step "epochs"; compressed
    # here to thirds of the run so the demo exercises the reshape +
    # recompile path the real CLI takes
    # curriculum=False pins the window (single compiled program) for
    # time-boxed runs: each window bump is a fresh ~10-min cold compile
    # through the remote compiler when the persistent cache is empty
    max_frames = d.max_frames
    bumps = sorted({steps // 3: d.max_frames + 1,
                    2 * steps // 3: d.max_frames + 2}.items()
                   ) if curriculum else []
    if n:                               # resumed: re-apply past bumps
        past = [f for s, f in bumps if n >= s]
        if past:
            max_frames = past[-1]
            reader.set_max_frames(max_frames)
            print(json.dumps({"curriculum_window": max_frames}),
                  flush=True)

    rng = np.random.default_rng(0)
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
                    "window": max_frames,
                    "wall_s": round(time.perf_counter() - tic, 1)}),
                    flush=True)
            if not resumed and n >= resume_at:
                ckpt.save_checkpoint(ckpt_dir, n, state)
                skeleton = jax.device_get(state)
                state = ckpt.restore_checkpoint(ckpt_dir,
                                                target=skeleton)
                state = jax.device_put(state)
                resumed = True
                print(json.dumps({"resumed_at": n}), flush=True)
                break                   # re-enter with a fresh iterator
            want = [f for s, f in bumps if n >= s and f > max_frames]
            if want:
                max_frames = want[-1]
                reader.set_max_frames(max_frames)
                print(json.dumps({"curriculum_window": max_frames}),
                      flush=True)
                break                   # new window length => new shapes
            if n >= steps:
                break

    host_state = jax.device_get(state)
    results = evaluate_h5(gen, host_state, cfg, test_reader,
                          max_keyframes=8)
    results = {k: round(v, 3) for k, v in results.items()}
    results["beats_dain"] = bool(
        results["OURS_PSNR"] > results["DAIN_PSNR"]
        and results["OURS_SSIM"] > results["DAIN_SSIM"])
    print(json.dumps(results))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 500,
         float(sys.argv[2]) if len(sys.argv) > 2 else 0.0,
         int(sys.argv[3]) if len(sys.argv) > 3 else 0,
         float(sys.argv[4]) if len(sys.argv) > 4 else 0.0,
         sys.argv[5] != "0" if len(sys.argv) > 5 else True)
