"""Stage-level breakdown of the e2e interpolation pipeline on the TPU
(VERDICT r2 weak #2: the 24 ms/frame headline had no per-stage split).

Times each stage of bench.py's fused pipeline as its own jit with the
same tamper-proof methodology (iterations chained through a data
dependency, hard sync via a device-side scalar fetch — BASELINE.md
"timing methodology"), then the fused whole for cross-check:

  1. motion upsample  — transformer keyframe→dense pose inference
  2. flow backgrounds — pyramidal-LK warp of keyframes to in-betweens
  3. label prep       — affine + fused Pallas rasterization stack
  4. rollout          — segment-parallel SPADE rollout + compositing

Run:  python scripts/profile_e2e_tpu.py        (serialize TPU jobs!)
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


def main(rate: int = 4, keyframes: int = 8, reps: int = 10):
    enable_compile_cache()

    from renderloom.core.config import MotionConfig, RendererConfig
    from renderloom.data.hsm import prepare_batch
    from renderloom.eval.motion_infer import (MotionInterpolator,
                                              bucket_length)
    from renderloom.ops.flow import upsample_background
    from renderloom.train.gan import (create_gan_state,
                                      make_inference_pair,
                                      make_segment_rollout)
    from renderloom.train.motion import create_motion_state

    on_tpu = jax.default_backend() == "tpu"
    dtype = "bfloat16" if on_tpu else "float32"
    mcfg = MotionConfig(compute_dtype=dtype)
    rcfg = RendererConfig(compute_dtype=dtype)
    H, W = rcfg.data.model_height, rcfg.data.model_width

    m_model, _, m_state = create_motion_state(jax.random.PRNGKey(0), mcfg)
    interp = MotionInterpolator(
        m_model, m_state.params, mcfg,
        np.zeros((19, 2), np.float32), np.ones((19, 2), np.float32))
    gen, _, _, r_state = create_gan_state(jax.random.PRNGKey(1), rcfg,
                                          height=H, width=W)
    inf_gen, folded_g = make_inference_pair(rcfg, r_state.params_g,
                                            r_state.stats_g)
    rollout = make_segment_rollout(inf_gen, rcfg,
                                   rate)

    rng = np.random.default_rng(0)
    K = keyframes
    L = (K - 1) * rate + 1
    motion = jnp.asarray(
        rng.uniform(-0.4, 0.4, (19, 2, K)), jnp.float32)
    conf = jnp.asarray(np.full((19, 1, K), 0.9), jnp.float32)
    keys_dev = jnp.asarray(
        rng.uniform(0, 1, (K, H, W, 3)), jnp.float32)
    is_key = jnp.asarray(np.arange(L) % rate == 0)
    interp_pad = bucket_length(L, rate)
    times = int(np.log2(rate))
    fused_raster = on_tpu
    from renderloom.models.fastpath import use_fastpath
    packed_label = fused_raster and use_fastpath()

    # ---- stage jits.  Two methodology rules (both learned the hard
    # way): (1) every big array is an explicit ARGUMENT — captured
    # arrays embed as HLO constants, which lets XLA fold whole
    # carry-independent subgraphs at compile time and blows the
    # tunnel's remote-compile upload limit (HTTP 413) for batch-sized
    # captures; (2) the carry threads one input so reps serialize.
    @jax.jit
    def s_motion(m_params, motion_in, conf_in):
        pred, _, dense_conf = interp._run(
            m_params, motion_in, conf_in, rate, times, interp_pad)
        out = (pred, dense_conf)
        return out, jnp.sum(pred) * 1e-20

    @jax.jit
    def s_flow(keys):
        backs = upsample_background(keys, rate, levels=3,
                                    iters=1, flow_scale=4)
        return backs, jnp.sum(backs) * 1e-20

    (pred0, dconf0), _ = s_motion(interp.params, motion, conf)
    backs0, _ = s_flow(keys_dev)

    @jax.jit
    def s_prep(pred_in, dconf_in, backs, keys):
        poses = jnp.concatenate(
            [pred_in[:, :, :L] * 256 + 256, dconf_in], axis=1)
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
        batch = {"label": prep["label"], "back": prep["back"],
                 "key_img": prep["image"], "is_key": is_key}
        return batch, jnp.sum(prep["label"]) * 1e-20

    batch0, _ = s_prep(pred0, dconf0, backs0, keys_dev)

    @jax.jit
    def s_rollout(g_params, batch):
        fused, _ = rollout(g_params, {}, batch)
        return fused, jnp.sum(fused) * 1e-20

    # ---- fused whole (bench.py's e2e_once) for cross-check ----
    @jax.jit
    def s_all(m_params, g_params, motion_in, conf_in, keys):
        pred, _, dense_conf = interp._run(
            m_params, motion_in, conf_in, rate, times, interp_pad)
        backs = upsample_background(keys, rate, levels=3, iters=1,
                                    flow_scale=4)
        poses = jnp.concatenate([pred[:, :, :L] * 256 + 256, dense_conf],
                                axis=1)
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
        b = {"label": prep["label"], "back": prep["back"],
             "key_img": prep["image"], "is_key": is_key}
        fused, _ = rollout(g_params, {}, b)
        return fused, jnp.sum(fused) * 1e-20

    def bench(fn, name, make_args):
        # warm up TWICE: the first call traces the weak-typed 0.0
        # carry, the second traces (and compiles) the array-typed carry
        # the timed loop actually uses — without it the retrace lands
        # inside the timed reps
        _, carry = fn(*make_args(0.0))
        _, carry = fn(*make_args(carry))
        float(carry)                        # hard sync
        tic = time.perf_counter()
        for _ in range(reps):
            _, carry = fn(*make_args(carry))
        float(carry)                        # hard sync
        ms = (time.perf_counter() - tic) / reps * 1e3
        print(f"{name:<22s} {ms:8.2f} ms/clip   "
              f"{ms / L:6.3f} ms/frame", flush=True)
        return ms

    print(f"platform={jax.default_backend()}  {H}x{W} rate={rate} "
          f"K={K} -> {L} frames, {reps} reps", flush=True)
    t_m = bench(s_motion, "motion upsample",
                lambda c: (interp.params, motion + c, conf))
    t_f = bench(s_flow, "flow backgrounds",
                lambda c: (keys_dev + c,))
    t_p = bench(s_prep, "label prep (raster)",
                lambda c: (pred0 + c, dconf0, backs0, keys_dev))
    t_r = bench(s_rollout, "rollout+composite",
                lambda c: (folded_g,
                           {**batch0, "back": batch0["back"] + c}))
    t_a = bench(s_all, "FUSED pipeline",
                lambda c: (interp.params, folded_g, motion + c, conf,
                           keys_dev + c))
    print(f"{'sum of stages':<22s} {t_m + t_f + t_p + t_r:8.2f} ms/clip "
          f"(fused saves {(t_m + t_f + t_p + t_r) - t_a:+.2f} ms of "
          "dispatch/overlap)")
    print(f"e2e frames/s (fused): {L / (t_a / 1e3):.1f}")


if __name__ == "__main__":
    main()
