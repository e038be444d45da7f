"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.md north star): end-to-end interpolated
frames/sec on one chip — low-FPS keyframes + poses → dense poses
(motion transformer) → flow-warped backgrounds (DAIN replacement) →
autoregressive SPADE rollout with compositing, at the reference model
scale (d_model 128 6+6 transformer; 16→512-filter generator; 480×320
frames, ``configs/HSM.yaml:189-193``) and upsample rate 4.

The reference publishes no numbers (its per-iteration wall time is the
only observable — BASELINE.md), so ``vs_baseline`` is null until a real
``published`` entry exists in BASELINE.json to compare against.

Select other metrics with BENCH_METRIC=motion_train|e2e.
Run: python bench.py   (axon TPU on the driver host; CPU under
JAX_PLATFORMS=cpu).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _enable_compile_cache():
    """Persistent XLA compile cache — first compiles through the
    tunneled-TPU remote compiler take minutes; cached reruns are free."""
    import jax

    cache_dir = os.environ.get("JAX_CACHE_DIR",
                               os.path.expanduser("~/.cache/renderloom_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _select_backend() -> str:
    """Probe the accelerator in a bounded subprocess (a dead tunnel can
    hang backend init for tens of minutes); fall back to CPU when it's
    unreachable so the driver always gets a JSON line, tagged with the
    platform the bench actually ran on."""
    import subprocess

    timeout = float(os.environ.get("BENCH_PROBE_TIMEOUT", "180"))
    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout)
        ok = probe.returncode == 0
        platform = probe.stdout.strip().splitlines()[-1] if ok else ""
    except subprocess.TimeoutExpired:
        ok, platform = False, ""

    import jax

    if not ok or not platform:
        print("accelerator unavailable; falling back to CPU",
              file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")
    return jax.devices()[0].platform


def bench_motion_train(steps: int = 20, warmup: int = 3) -> dict:
    """Full motion-transformer train-step throughput (seq/s/chip)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from renderloom.core.config import MotionConfig
    from renderloom.parallel import make_mesh, replicate, shard_batch
    from renderloom.train.motion import create_motion_state, make_train_step

    import dataclasses

    on_tpu = jax.default_backend() == "tpu"
    cfg = MotionConfig(compute_dtype="bfloat16" if on_tpu else "float32")
    if not on_tpu:   # CPU fallback: reduced shapes, tagged below
        cfg = dataclasses.replace(
            cfg, batch_size=4, dataset=dataclasses.replace(
                cfg.dataset, max_seq_length=65))
        steps, warmup = 5, 1
    mesh = make_mesh()
    model, tx, state = create_motion_state(jax.random.PRNGKey(0), cfg)
    state = replicate(mesh, state)
    step = make_train_step(model, tx, cfg, jnp.zeros((19, 2)),
                           jnp.ones((19, 2)))

    L, B = cfg.dataset.max_seq_length, cfg.batch_size
    rng = np.random.default_rng(0)
    batch = shard_batch(mesh, {
        "motion3d": rng.normal(0, 0.3, (B, 52, 3, L)).astype(np.float32),
        "pad_mask": np.zeros((B, L), dtype=bool),
    })
    for _ in range(warmup):
        state, metrics = step(state, batch)
    float(metrics["loss/total"])       # hard sync (scalar fetch)
    tic = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, batch)
    float(metrics["loss/total"])       # steps chain through state
    wall = time.perf_counter() - tic
    result = {"metric": "motion_train_seqs_per_sec",
              "value": round(steps * B / wall, 2), "unit": "seq/s",
              "vs_baseline": None}
    if not on_tpu:
        result["scaled"] = "L=65 B=4 (CPU-reduced shapes)"
    return result


def bench_e2e(rate: int = 4, keyframes: int = 8, repeats: int = 3
              ) -> dict:
    """End-to-end interpolation throughput in output frames/sec."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from renderloom.core.config import MotionConfig, RendererConfig
    from renderloom.eval.motion_infer import MotionInterpolator
    from renderloom.ops.flow import upsample_background
    from renderloom.train.gan import (create_gan_state,
                                      make_inference_pair,
                                      make_segment_rollout)
    from renderloom.train.motion import create_motion_state

    import dataclasses

    # bfloat16 compute on the MXU (params/norm statistics stay fp32);
    # CPU bf16 is emulated and slower, so keep fp32 there
    on_tpu = jax.default_backend() == "tpu"
    dtype = "bfloat16" if on_tpu else "float32"
    mcfg = MotionConfig(compute_dtype=dtype)
    rcfg = RendererConfig(compute_dtype=dtype)
    if not on_tpu:
        # CPU fallback: full 480x320 reference scale never finishes on a
        # 1-core host — run a reduced shape and tag the JSON as scaled
        # (numbers are then only comparable CPU-to-CPU at this scale)
        rcfg = dataclasses.replace(rcfg, data=dataclasses.replace(
            rcfg.data, model_height=64, model_width=96))
        rate, keyframes, repeats = 2, 4, 2
    H, W = rcfg.data.model_height, rcfg.data.model_width

    m_model, _, m_state = create_motion_state(jax.random.PRNGKey(0), mcfg)
    interp = MotionInterpolator(
        m_model, m_state.params, mcfg,
        np.zeros((19, 2), np.float32), np.ones((19, 2), np.float32))

    gen, _, _, r_state = create_gan_state(jax.random.PRNGKey(1), rcfg,
                                          height=H, width=W)
    # segment-parallel rollout: keyframes reset the autoregressive
    # chain, so the (K-1) segments run as one batch with rate-1
    # sequential steps (exact vs make_rollout; see train/gan.py).
    # Spectral norm is folded into the kernels once (bit-identical) so
    # the rollout skips hundreds of tiny serial power-iteration matmuls
    # on TPU the mask net additionally runs the exact parity-layout fast
    # path (renderloom/models/fastpath.py)
    inf_gen, folded_g = make_inference_pair(rcfg, r_state.params_g,
                                            r_state.stats_g)
    rollout = make_segment_rollout(inf_gen, rcfg, rate)

    rng = np.random.default_rng(0)
    K = keyframes
    L = (K - 1) * rate + 1
    motion = rng.uniform(-0.4, 0.4, (19, 2, K)).astype(np.float64)
    conf = np.full((19, 1, K), 0.9)
    keys_np = rng.uniform(0, 1, (K, H, W, 3)).astype(np.float32)
    from renderloom.eval.motion_infer import bucket_length
    interp_pad = bucket_length(L, rate)

    from renderloom.data.hsm import prepare_batch

    keys_dev = jnp.asarray(keys_np)
    is_key = jnp.asarray(np.arange(L) % rate == 0)
    fused_raster = jax.default_backend() == "tpu"
    # the fast path consumes parity-packed labels directly, so the fused
    # rasterizer emits them packed — zero space-to-depth in the rollout
    from renderloom.models.fastpath import use_fastpath
    packed_label = fused_raster and use_fastpath()

    @jax.jit
    def prep_fn(pred, dense_conf, backs, keys):
        poses = jnp.concatenate([pred * 256 + 256, dense_conf], axis=1)
        poses = jnp.transpose(poses, (2, 0, 1)).astype(jnp.float32)
        from renderloom.eval.pipeline import assemble_keyframe_stream
        images = assemble_keyframe_stream(keys * 255.0, rate)
        prep = prepare_batch(None, {"images": images[None],
                                    "dain": backs[None] * 255.0,
                                    "poses": poses[None]},
                             rcfg.data, train=False,
                             fused_raster=fused_raster,
                             label_dtype=jnp.bfloat16 if on_tpu
                             else None,
                             packed_label=packed_label,
                             want_masks=False)
        return {"label": prep["label"], "back": prep["back"],
                "key_img": prep["image"], "is_key": is_key}

    times = int(np.log2(rate))

    # the WHOLE pipeline (motion upsample → flow backgrounds → label
    # rasterization → segment rollout + compositing) is ONE jit: frames
    # never round-trip to host between stages and the driver pays one
    # dispatch per clip (per-call latency through the tunneled TPU is
    # tens of ms — it dominated the un-fused number)
    @jax.jit
    def e2e_once(m_params, g_params, motion_dev, conf_dev, keys):
        pred, _, dense_conf = interp._run(m_params, motion_dev, conf_dev,
                                          rate, times, interp_pad)
        # quarter-res flow, single LK iteration: the quality-validated
        # setting for the background role — 62.4 dB mean / 54.0 dB min
        # on subpixel pans, beating full-res LK and the learned UNet
        # (BASELINE.md "Flow-backend quality gate"; flow gathers are
        # the TPU cost).  `keys` MUST be an argument: captured it
        # embeds as an HLO constant and XLA folds the whole
        # carry-independent flow subgraph out of the timed program.
        backs = upsample_background(keys, rate, levels=3,
                                    iters=1, flow_scale=4)
        batch = prep_fn(pred[:, :, :L], dense_conf, backs, keys)
        fused, _ = rollout(g_params, {}, batch)
        # scalar checksum: the next iteration's input depends on it, so
        # repeated runs cannot overlap/cache, and fetching it at the end
        # is a hard sync (block_until_ready through the tunneled device
        # does not reliably await completion)
        return fused, jnp.sum(fused) * 1e-20

    motion_dev = jnp.asarray(motion, jnp.float32)
    conf_dev = jnp.asarray(conf, jnp.float32)

    def run_once(carry):
        return e2e_once(interp.params, folded_g,
                        motion_dev + carry, conf_dev, keys_dev + carry)

    _, carry = run_once(0.0)                   # compile (weak-typed 0.0)
    _, carry = run_once(carry)                 # compile the array-typed
    float(carry)                               # carry trace + hard sync
    tic = time.perf_counter()
    for _ in range(repeats):
        out, carry = run_once(carry)
    float(carry)                               # hard sync
    wall = time.perf_counter() - tic
    fps = repeats * L / wall
    result = {"metric": "e2e_interp_frames_per_sec",
              "value": round(fps, 2), "unit": "frame/s",
              "vs_baseline": None}
    if not on_tpu:
        result["scaled"] = f"{H}x{W} rate{rate} (CPU-reduced shapes)"
    return result


def bench_gan_train(steps: int = 4, warmup: int = 1) -> dict:
    """Full-scale renderer GAN train-step throughput (windows/s/chip):
    batch 4 × 4-frame windows at 480×320, per-frame D/G updates
    (the reference's expensive workload, configs/HSM.yaml)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from renderloom.core.config import RendererConfig
    from renderloom.models.perceptual import PerceptualLoss
    import dataclasses

    from renderloom.parallel import make_mesh, replicate, shard_batch
    from renderloom.train.gan import create_gan_state, make_gan_train_step

    on_tpu = jax.default_backend() == "tpu"
    cfg = RendererConfig(
        compute_dtype="bfloat16" if on_tpu else "float32")
    # batch 4 (the reference's config) fits HBM without remat; remat
    # costs ~3-10% step time (measured; keep it for larger frames).
    # BENCH_GAN_BATCH=8 runs the throughput-optimal config
    # (scripts/gan_cost_tpu.py: near-perfect scaling to B=8 — the B=4
    # step is utilization-starved, see BASELINE.md round-3 table).
    cfg = dataclasses.replace(
        cfg, batch_size=int(os.environ.get("BENCH_GAN_BATCH",
                                           cfg.batch_size)),
        gen=dataclasses.replace(cfg.gen, do_checkpoint=False))
    if not on_tpu:   # CPU fallback: reduced shapes, tagged below
        cfg = dataclasses.replace(
            cfg, batch_size=2,
            gen=dataclasses.replace(cfg.gen, num_filters=4,
                                    max_num_filters=32),
            data=dataclasses.replace(cfg.data, model_height=64,
                                     model_width=96, max_frames=3))
        steps, warmup = 2, 1
    H, W = cfg.data.model_height, cfg.data.model_width
    mesh = make_mesh()
    gen, dis, txs, state = create_gan_state(jax.random.PRNGKey(0), cfg,
                                            height=H, width=W)
    state = replicate(mesh, state)
    step = make_gan_train_step(
        gen, dis, txs, cfg,
        PerceptualLoss(compute_dtype=cfg.compute_dtype))

    B, L = cfg.batch_size, cfg.data.max_frames
    rng = np.random.default_rng(0)
    batch = shard_batch(mesh, {
        "label": rng.uniform(-1, 1, (B, L, H, W, 22)).astype(np.float32),
        "image": rng.uniform(-1, 1, (B, L, H, W, 3)).astype(np.float32),
        "back": rng.uniform(-1, 1, (B, L, H, W, 3)).astype(np.float32),
        "fg_mask": (rng.uniform(0, 1, (B, L, H, W, 1)) > 0.5
                    ).astype(np.float32),
    })
    for _ in range(warmup):
        state, metrics = step(state, batch)
    float(metrics["g/total"])          # hard sync (scalar fetch)
    tic = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, batch)
    float(metrics["g/total"])          # steps chain through state
    wall = time.perf_counter() - tic
    result = {"metric": "gan_train_windows_per_sec",
              "value": round(steps * B / wall, 3), "unit": "window/s",
              "vs_baseline": None}
    if not on_tpu:
        result["scaled"] = f"{H}x{W} small-gen (CPU-reduced shapes)"
    return result


def main():
    _enable_compile_cache()
    platform = _select_backend()
    which = os.environ.get("BENCH_METRIC", "e2e")
    if which == "motion_train":
        result = bench_motion_train()
    elif which == "gan_train":
        result = bench_gan_train()
    else:
        result = bench_e2e()
    result["platform"] = platform
    print(json.dumps(result))


if __name__ == "__main__":
    main()
