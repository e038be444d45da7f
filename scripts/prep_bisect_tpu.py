"""Bisect the e2e "label prep" stage (VERDICT r3 #4 / r4 #4).

profile_e2e_tpu.py measures label prep at ~43 ms/clip of which the
fused raster kernel itself is only ~4.5 ms — this script splits the
other ~39 ms into its sub-stages, each as its own jit with the
chained-carry + device-scalar hard-sync methodology, and also measures
the REAL-resolution ingest path: the reference stores frames at
768×512 on disk (``HumanSloMo_Dataset/lib/gen_dataset.py:36``) and
models at 480×320 (``configs/HSM.yaml:189-193``), so real serving pays
an affine resize that bench.py's model-size synthetic keyframes skip
via the statically-identity fast path (37e8a1b).

Stages (rate-4, 8 keyframes -> 29 frames, the bench protocol):

  assembly/scatter   images.at[::rate].set(keys)  — the pipeline
                     assembly as bench.py builds it (TPU scatters
                     scalarize; suspect #1)
  assembly/concat    zeros-groups + concat + reshape equivalent
  to_unit            both full-stream [-1,1] normalizations
  raster             the fused Pallas kernel alone (packed, maskless)
  prep@model         whole prepare_batch, 480×320 inputs (identity)
  prep@disk          whole prepare_batch, 768×512 inputs (warp path)
  warp-only          the two affine-warp streams 768×512 -> 480×320

Run: python scripts/prep_bisect_tpu.py [reps]   (serialize TPU jobs!)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from renderloom.core.cache import enable_compile_cache


def main(reps: int = 10, rate: int = 4, keyframes: int = 8):
    enable_compile_cache()

    from renderloom.core.config import RendererConfig
    from renderloom.data.hsm import prepare_batch
    from renderloom.ops import image as img_ops

    on_tpu = jax.default_backend() == "tpu"
    rcfg = RendererConfig(
        compute_dtype="bfloat16" if on_tpu else "float32")
    H, W = rcfg.data.model_height, rcfg.data.model_width
    DH, DW = 512, 768                    # the reference's on-disk size
    K = keyframes
    L = (K - 1) * rate + 1
    fused = on_tpu
    lbl_dt = jnp.bfloat16 if on_tpu else None

    rng = np.random.default_rng(0)
    keys_dev = jnp.asarray(rng.uniform(0, 255, (K, H, W, 3)), jnp.float32)
    backs = jnp.asarray(rng.uniform(0, 255, (L, H, W, 3)), jnp.float32)
    keys_disk = jnp.asarray(rng.uniform(0, 255, (K, DH, DW, 3)),
                            jnp.float32)
    backs_disk = jnp.asarray(rng.uniform(0, 255, (L, DH, DW, 3)),
                             jnp.float32)
    poses = jnp.asarray(
        np.concatenate([rng.uniform(50, 270, (L, 19, 2)),
                        np.full((L, 19, 1), 0.9)], -1), jnp.float32)
    poses_disk = jnp.asarray(
        np.concatenate([rng.uniform(80, 430, (L, 19, 2)),
                        np.full((L, 19, 1), 0.9)], -1), jnp.float32)

    results = {}

    def bench(fn, name, make_args):
        _, carry = fn(*make_args(0.0))
        _, carry = fn(*make_args(carry))   # array-typed carry retrace
        float(carry)
        tic = time.perf_counter()
        for _ in range(reps):
            _, carry = fn(*make_args(carry))
        float(carry)
        ms = (time.perf_counter() - tic) / reps * 1e3
        results[name] = round(ms, 2)
        print(f"{name:<18s} {ms:8.2f} ms/clip", flush=True)
        return ms

    # ---- keyframe->stream assembly variants -------------------------
    @jax.jit
    def a_scatter(keys):
        images = jnp.zeros((L, H, W, 3), jnp.float32)
        images = images.at[::rate].set(keys)
        return images, jnp.sum(images) * 1e-20

    @jax.jit
    def a_concat(keys):
        # (K-1) groups of [key, zeros x (rate-1)] then the last key:
        # pure concat/reshape, no scatter
        z = jnp.zeros((K - 1, rate - 1, H, W, 3), jnp.float32)
        grp = jnp.concatenate([keys[:-1, None], z], axis=1)
        images = jnp.concatenate(
            [grp.reshape(-1, H, W, 3), keys[-1:]], axis=0)
        return images, jnp.sum(images) * 1e-20

    i1, _ = a_scatter(keys_dev)
    i2, _ = a_concat(keys_dev)
    assert float(jnp.abs(i1 - i2).max()) == 0.0, "assembly mismatch"

    bench(a_scatter, "assembly/scatter", lambda c: (keys_dev + c,))
    bench(a_concat, "assembly/concat", lambda c: (keys_dev + c,))

    # ---- to_unit normalization of both streams ----------------------
    @jax.jit
    def s_unit(images, dns):
        a = images / 127.5 - 1.0
        b = dns / 127.5 - 1.0
        return (a, b), (jnp.sum(a) + jnp.sum(b)) * 1e-20

    bench(s_unit, "to_unit", lambda c: (i1 + c, backs))

    # ---- fused raster kernel alone ----------------------------------
    from renderloom.ops.rasterize_pallas import rasterize_frames_fused

    @jax.jit
    def s_raster(coords, conf):
        ras = rasterize_frames_fused(
            None, coords, conf, H, W, gauss_sigma=rcfg.data.gauss_sigma,
            thres=rcfg.data.skeleton_thres,
            foot_thres=rcfg.data.foot_thres, train=False,
            out_dtype=lbl_dt or jnp.float32,
            layout="packed" if on_tpu else "nhwc", emit_masks=False)
        lbl = ras["label"]
        return lbl, jnp.sum(lbl.astype(jnp.float32)) * 1e-20

    if fused:
        bench(s_raster, "raster",
              lambda c: (poses[:, :, :2] + c, poses[:, :, 2]))

    # ---- whole prepare_batch, model-size (identity path) ------------
    @jax.jit
    def s_prep_model(images, dns, pose):
        prep = prepare_batch(None, {"images": images[None],
                                    "dain": dns[None],
                                    "poses": pose[None]},
                             rcfg.data, train=False, fused_raster=fused,
                             label_dtype=lbl_dt,
                             packed_label=fused and on_tpu,
                             want_masks=False)
        return prep, jnp.sum(prep["label"].astype(jnp.float32)) * 1e-20

    bench(s_prep_model, "prep@model",
          lambda c: (i1 + c, backs, poses))

    # ---- warp-only at disk resolution --------------------------------
    m = img_ops.resize_matrix(DH, DW, H, W)

    @jax.jit
    def s_warp(images, dns):
        warp = jax.vmap(lambda im: img_ops.affine_warp(
            im / 127.5 - 1.0, m, H, W))
        a, b = warp(images), warp(dns)
        return (a, b), (jnp.sum(a) + jnp.sum(b)) * 1e-20

    bench(s_warp, "warp-only@disk",
          lambda c: (keys_disk[:1] * 0 + c + jnp.tile(
              keys_disk, (L // K + 1, 1, 1, 1))[:L], backs_disk))

    # ---- separable MXU resize at disk resolution (the round-5 lever:
    # a pure-scale affine factorizes into two weight matmuls;
    # prepare_batch's deterministic branch now dispatches here) -------
    @jax.jit
    def s_sep(images, dns):
        res = lambda x: img_ops.separable_resize(x / 127.5 - 1.0, H, W)
        a, b = res(images), res(dns)
        return (a, b), (jnp.sum(a) + jnp.sum(b)) * 1e-20

    bench(s_sep, "sep-resize@disk",
          lambda c: (keys_disk[:1] * 0 + c + jnp.tile(
              keys_disk, (L // K + 1, 1, 1, 1))[:L], backs_disk))

    # ---- whole prepare_batch, disk-size (warp path) ------------------
    @jax.jit
    def a_concat_disk(keys):
        z = jnp.zeros((K - 1, rate - 1, DH, DW, 3), jnp.float32)
        grp = jnp.concatenate([keys[:-1, None], z], axis=1)
        return jnp.concatenate([grp.reshape(-1, DH, DW, 3), keys[-1:]],
                               axis=0)

    imgs_disk = a_concat_disk(keys_disk)

    @jax.jit
    def s_prep_disk(images, dns, pose):
        prep = prepare_batch(None, {"images": images[None],
                                    "dain": dns[None],
                                    "poses": pose[None]},
                             rcfg.data, train=False, fused_raster=fused,
                             label_dtype=lbl_dt,
                             packed_label=fused and on_tpu,
                             want_masks=False)
        return prep, jnp.sum(prep["label"].astype(jnp.float32)) * 1e-20

    bench(s_prep_disk, "prep@disk",
          lambda c: (imgs_disk + c, backs_disk, poses_disk))

    print(json.dumps(results), flush=True)
    with open("/tmp/prep_bisect.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
