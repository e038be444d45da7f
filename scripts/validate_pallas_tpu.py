"""Validate + micro-bench the fused Pallas rasterizer on a real TPU.

Compares the compiled Pallas kernel (``ops/rasterize_pallas.py``) against
the vmapped jnp path (``ops/rasterize.py``) at the reference label scale
(480×320, 19 heatmap channels + skeleton + masks —
``Pose_Guided_Neural_Rendering/configs/HSM.yaml:189-193``) and times
both.  Heatmaps/masks must match bit-exactly; the skeleton image is
allowed 5e-3 (TPU rsqrt/transcendental rounding vs the jnp division
path).  Results are recorded in BASELINE.md.

Run on the TPU host: ``python scripts/validate_pallas_tpu.py``.
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


def main():
    enable_compile_cache()
    assert jax.default_backend() == "tpu", jax.devices()

    from renderloom.ops import rasterize as R
    from renderloom.ops.rasterize_pallas import rasterize_frames_fused

    H, W, F = 320, 480, 16
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.uniform(40, 280, (F, 19, 2)), jnp.float32)
    conf = jnp.asarray(rng.uniform(0.5, 1.0, (F, 19)), jnp.float32)

    jnp_path = jax.jit(
        lambda c, cf: R.rasterize_frames(None, c, cf, H, W, train=False))
    pal_path = jax.jit(
        lambda c, cf: rasterize_frames_fused(None, c, cf, H, W,
                                             train=False))

    a = jax.block_until_ready(jnp_path(coords, conf))
    b = jax.block_until_ready(pal_path(coords, conf))
    tol = {"heatmaps": 0.0, "mask": 0.0, "part_mask": 0.0,
           "skeleton": 5e-3}
    for k in a:
        d = float(jnp.abs(a[k] - b[k]).max())
        print(f"max|diff| {k}: {d:.3e} (tol {tol[k]:g})")
        assert d <= tol[k], k

    # chained-carry timing with a device-side scalar fetch at the end:
    # block_until_ready does not reliably await completion through the
    # axon tunnel (CLAUDE.md) — the carry forces serialization and the
    # float() is the hard sync
    def bench(fn, n=40):
        c = coords
        out = fn(c, conf)
        float(out["mask"].sum())                      # warm + sync
        tic = time.perf_counter()
        for _ in range(n):
            c = c + out["mask"][0, 0, 0] * 1e-20      # data dependency
            out = fn(c, conf)
        float(out["mask"].sum())
        return (time.perf_counter() - tic) / n * 1e3

    t_jnp = bench(jnp_path)
    t_pal = bench(pal_path)
    print(json.dumps({
        "jnp_ms_per_16_frames": round(t_jnp, 3),
        "pallas_ms_per_16_frames": round(t_pal, 3),
        "speedup": round(t_jnp / t_pal, 2),
    }))

    # ---- layout x tile_h x dtype sweep (VERDICT r3 #4: the 42 ms
    # label-prep stage) — all three label layouts at several row-tile
    # sizes; nhwc/packed also checked exact vs the assembled jnp label
    lbl_ref = jnp.concatenate(
        [jnp.transpose(a["skeleton"], (0, 2, 3, 1)) * 2.0 - 1.0,
         jnp.transpose(a["heatmaps"], (0, 2, 3, 1))], axis=-1)
    rows = []
    # tile_h: divisors of H only (ADVICE r4: 96 does not divide 320,
    # so the kernel silently fell back to tile_h=H — the exact
    # full-height config that hung the remote compiler ~28 min — and
    # the row was recorded under the wrong label).  Cap below 160: the
    # first capture showed 160 already 4x slower than 32/64.
    tile_hs = [t for t in (16, 32, 64, 80) if H % t == 0]
    for layout in ("cfhw", "nhwc", "packed"):
        for th in tile_hs:
            for dt in (jnp.float32, jnp.bfloat16):
                fn = jax.jit(lambda c, cf, lay=layout, t=th, d=dt:
                             rasterize_frames_fused(
                                 None, c, cf, H, W, train=False,
                                 tile_h=t, out_dtype=d, layout=lay))
                try:
                    out = fn(coords, conf)
                    if layout != "cfhw" and dt == jnp.float32:
                        got = out["label"]
                        if layout == "packed":
                            from renderloom.models.fastpath import \
                                depth_to_space
                            got = depth_to_space(got)
                        err = float(jnp.abs(got - lbl_ref).max())
                        assert err <= 5e-3, (layout, th, err)
                    ms = bench(fn)
                except Exception as e:                # noqa: BLE001
                    rows.append({"layout": layout, "tile_h": th,
                                 "dtype": dt.__name__,
                                 "error": repr(e)[:120]})
                    print(json.dumps(rows[-1]), flush=True)
                    continue
                rows.append({"layout": layout, "tile_h": th,
                             "dtype": dt.__name__,
                             "ms_per_16f": round(ms, 3)})
                print(json.dumps(rows[-1]), flush=True)
    with open("/tmp/raster_sweep.json", "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
