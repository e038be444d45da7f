"""One-program serving pipeline: motion upsample → flow backgrounds →
label rasterization → segment rollout + compositing.

The reference serves a clip by running three repos in sequence with
frames round-tripping through disk between them
(`Human_Motion_Modelling/inference.py` → the DAIN scripts →
`Pose_Guided_Neural_Rendering/inference.py:11-47`).  Here the whole
chain is ONE jittable function over N clips: frames never leave the
device between stages and a served batch costs one dispatch (per-call
latency through a tunneled TPU is tens of ms — it dominated the
un-fused number; see bench.py).

This is the library form of the closure the measurement scripts time
(`bench.py:bench_e2e` single-clip, `scripts/serving_e2e_tpu.py`
batched) and the unit `renderloom.eval.export` serializes for
Python-free deployment.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def assemble_keyframe_stream(keys: jax.Array, rate: int) -> jax.Array:
    """Spread K keyframes into an L=(K−1)·rate+1 frame stream (zeros at
    in-between slots) WITHOUT a strided scatter: ``images.at[::rate]
    .set(keys)`` scalarizes on TPU, while (K−1) groups of
    [key, zeros×(rate−1)] built by concat+reshape are pure layout ops.
    Exactness vs the scatter form is asserted in
    scripts/prep_bisect_tpu.py.  ``keys``: (..., K, H, W, C) — leading
    batch dims allowed."""
    *lead, K, H, W, C = keys.shape
    z = jnp.zeros((*lead, K - 1, rate - 1, H, W, C), keys.dtype)
    grp = jnp.concatenate([keys[..., :-1, None, :, :, :], z], axis=-4)
    flat = grp.reshape(*lead, (K - 1) * rate, H, W, C)
    return jnp.concatenate([flat, keys[..., -1:, :, :, :]], axis=-4)


def make_pipeline_fn(interp, rollout, data_cfg, rate: int,
                     keyframes: int, *, fused_raster: bool = False,
                     packed_label: bool = False,
                     label_bf16: bool = False,
                     flow_levels: int = 3, flow_iters: int = 1,
                     flow_scale: int = 4,
                     src_size: Optional[Tuple[int, int]] = None
                     ) -> Callable:
    """Compose the full clip-interpolation pipeline into one function.

    ``interp``: :class:`renderloom.eval.motion_infer.MotionInterpolator`
    (supplies the jitted motion-transformer upsampler + normalization
    stats).  ``rollout``: a `train.gan.make_segment_rollout` callable
    over the (folded) inference generator.  ``data_cfg``:
    :class:`RendererDataConfig` — sets H×W and raster parameters.

    Returns ``fn(m_params, g_params, motion, conf, keys) ->
    (fused, sync)`` with batched clip inputs::

        motion (N, 19, 2, K)   keyframe joints, normalized units
        conf   (N, 19, 1, K)   per-joint confidences
        keys   (N, K, H, W, 3) keyframe RGB in [0, 1]

    ``fused`` is (N, L, H, W, 3) with L = (K-1)·rate + 1; ``sync`` is a
    scalar checksum — fetch it (``float(sync)``) to hard-sync through
    tunneled devices where ``block_until_ready`` is unreliable, and
    feed it back into the inputs to chain timed iterations.

    The flow defaults (quarter-res pyramidal LK, one iteration) are the
    quality-validated background setting (BASELINE.md "Flow-backend
    quality gate").  ``fused_raster``/``packed_label``/``label_bf16``
    pick the TPU fast-path data layout; leave False for CPU.

    ``src_size=(src_h, src_w)``: accept keyframes at a different (e.g.
    on-disk) resolution — the reference stores 768×512 frames
    (``HumanSloMo_Dataset/lib/gen_dataset.py:36``) and models at
    480×320 — and resize them ONCE at ingest with the separable MXU
    resize (K frames per clip, not the assembled L-frame streams).
    ``motion``/``conf`` stay resolution-independent (normalized units).
    """
    from renderloom.data.hsm import prepare_batch
    from renderloom.eval.motion_infer import bucket_length
    from renderloom.ops.flow import upsample_background
    from renderloom.ops.image import separable_resize

    H = data_cfg.model_height
    W = data_cfg.model_width
    K = keyframes
    L = (K - 1) * rate + 1
    times = int(np.log2(rate))
    interp_pad = bucket_length(L, rate)
    is_key = jnp.asarray(np.arange(L) % rate == 0)

    def pipeline(m_params, g_params, motion, conf, keys):
        if src_size is not None:
            # disk-resolution ingest: resize the K keyframes ONCE,
            # before flow/assembly fan them out into L-frame streams
            # (prep_bisect_tpu.py: the general per-pixel-gather warp
            # at 768×512 cost 137 ms/clip; the two-matmul separable
            # form rides the MXU instead).
            keys = separable_resize(keys, H, W)
        pred, _, dconf = jax.vmap(
            lambda m, c: interp._run(m_params, m, c, rate, times,
                                     interp_pad))(motion, conf)
        # lax.map, NOT vmap: a vmapped flow holds every clip's warp
        # temporaries live at once — the allocations that pushed the
        # 4-clip program past HBM (scripts/serving_e2e_tpu.py).  Flow
        # is cheap relative to the rollout; serializing it across
        # clips costs little and frees ~2 GB for the rollout to batch
        # into.
        backs = jax.lax.map(
            lambda k: upsample_background(k, rate, levels=flow_levels,
                                          iters=flow_iters,
                                          flow_scale=flow_scale), keys)
        poses = jnp.concatenate([pred[:, :, :, :L] * 256 + 256, dconf],
                                axis=2)
        poses = jnp.transpose(poses, (0, 3, 1, 2)).astype(jnp.float32)
        images = assemble_keyframe_stream(keys * 255.0, rate)
        prep = prepare_batch(None, {"images": images,
                                    "dain": backs * 255.0,
                                    "poses": poses},
                             data_cfg, train=False,
                             fused_raster=fused_raster,
                             label_dtype=jnp.bfloat16 if label_bf16
                             else None,
                             packed_label=packed_label,
                             want_masks=False)
        batch = {"label": prep["label"], "back": prep["back"],
                 "key_img": prep["image"], "is_key": is_key}
        fused, _ = rollout(g_params, {}, batch)
        return fused, jnp.sum(fused) * 1e-20

    return pipeline


def build_pipeline(mcfg, rcfg, rate: int, keyframes: int, *,
                   m_params=None, g_params=None, g_stats=None,
                   mean: Optional[np.ndarray] = None,
                   std: Optional[np.ndarray] = None,
                   platform: Optional[str] = None,
                   src_size: Optional[Tuple[int, int]] = None):
    """Construct models + the pipeline fn from configs.

    ``m_params``/``g_params``+``g_stats``: trained weights (e.g. from
    `core.checkpoint.restore_checkpoint` states); random-initialized
    when omitted (smoke/benchmark use).  ``platform``: 'tpu' or 'cpu'
    — picks the data layout and generator path the way the serving
    scripts do (TPU: fused Pallas raster, parity-packed bf16 labels,
    parity-layout fast generator); defaults to the current backend.
    ``src_size``: see :func:`make_pipeline_fn` — accept keyframes at
    on-disk resolution (e.g. the reference's 768×512) and resize once
    at ingest.

    Returns ``(fn, m_params, folded_g)`` where ``fn`` is the
    :func:`make_pipeline_fn` callable closed over nothing — pass the
    returned params explicitly (or close over them for export).
    """
    from renderloom.eval.motion_infer import MotionInterpolator
    from renderloom.train.gan import (create_gan_state,
                                      make_inference_pair,
                                      make_segment_rollout)
    from renderloom.train.motion import create_motion_state

    if platform is None:
        platform = jax.default_backend()
    on_tpu = platform == "tpu"

    H, W = rcfg.data.model_height, rcfg.data.model_width
    m_model, _, m_state = create_motion_state(jax.random.PRNGKey(0),
                                              mcfg)
    if m_params is None:
        m_params = m_state.params
    interp = MotionInterpolator(
        m_model, m_params, mcfg,
        np.zeros((19, 2), np.float32) if mean is None else mean,
        np.ones((19, 2), np.float32) if std is None else std)

    if g_params is None:
        _, _, _, r_state = create_gan_state(jax.random.PRNGKey(1), rcfg,
                                            height=H, width=W)
        g_params, g_stats = r_state.params_g, r_state.stats_g

    # make_inference_pair consults use_fastpath() (backend + env); pin
    # it to the export/serving target instead of the tracing host.
    import os
    prev = os.environ.get("RENDERLOOM_FASTPATH")
    os.environ["RENDERLOOM_FASTPATH"] = "1" if on_tpu else "0"
    try:
        inf_gen, folded_g = make_inference_pair(rcfg, g_params, g_stats)
    finally:
        if prev is None:
            os.environ.pop("RENDERLOOM_FASTPATH", None)
        else:
            os.environ["RENDERLOOM_FASTPATH"] = prev
    rollout = make_segment_rollout(inf_gen, rcfg, rate)

    fn = make_pipeline_fn(interp, rollout, rcfg.data, rate, keyframes,
                          fused_raster=on_tpu, packed_label=on_tpu,
                          label_bf16=on_tpu, src_size=src_size)
    return fn, interp.params, folded_g
