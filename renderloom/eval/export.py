"""Ahead-of-time serving export: serialize the one-program pipeline
(`eval.pipeline`) to a self-contained StableHLO artifact.

Production deployment wants the serving program frozen — no Python
tracing, no flax, no config parsing at load time, and a stable
artifact that survives framework upgrades (StableHLO carries jax's
forward-compatibility guarantees).  `jax.export` embeds the trained
weights as constants, so one file is the whole servable; the TPU
program can be exported from a CPU-only build host (Mosaic/XLA lower
cross-platform) and shipped to the fleet.

The reference has no counterpart — serving it means installing three
repos + torch + CUDA ops and re-running Python per clip
(`README.md:12-48`).  Artifact layout: a single file, ``RLXP1`` magic,
a length-prefixed JSON meta header (shapes, rate, platforms), then the
serialized `jax.export.Exported` bytes.
"""

from __future__ import annotations

import json
import struct
from typing import Any, Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jexport

_MAGIC = b"RLXP1\n"


def export_pipeline(fn: Callable, m_params, g_params, n_clips: int,
                    keyframes: int, height: int, width: int,
                    rate: int, platforms: Sequence[str],
                    src_size: Tuple[int, int] = None
                    ) -> Tuple[jexport.Exported, Dict[str, Any]]:
    """Freeze ``fn`` (a :func:`eval.pipeline.make_pipeline_fn` callable)
    over its weights and export it for ``platforms``.

    The exported signature is ``(motion, conf, keys) -> (fused, sync)``
    at the static serving shape (N=``n_clips`` clips of K=``keyframes``
    keyframes) — static shapes are what lets XLA tile the program onto
    the MXU, and the batched-serving planner (`utils.serving`) already
    schedules requests as multisets of fixed program sizes.

    ``src_size=(src_h, src_w)``: the artifact accepts keyframes at
    on-disk resolution (``fn`` must have been built with the same
    ``src_size`` so it resizes at ingest) — lets a deployment feed the
    reference's 768×512 frames (`HumanSloMo_Dataset/lib/
    gen_dataset.py:36`) without a host-side resample.
    """
    serve = jax.jit(lambda motion, conf, keys:
                    fn(m_params, g_params, motion, conf, keys))
    in_h, in_w = src_size if src_size is not None else (height, width)
    specs = (
        jax.ShapeDtypeStruct((n_clips, 19, 2, keyframes), jnp.float32),
        jax.ShapeDtypeStruct((n_clips, 19, 1, keyframes), jnp.float32),
        jax.ShapeDtypeStruct((n_clips, keyframes, in_h, in_w, 3),
                             jnp.float32),
    )
    # pin the Pallas-kernel lowering target to the export target: a
    # TPU artifact traced on a CPU build host must lower the compiled
    # Mosaic kernels, not bake interpret-mode emulation
    # (renderloom.ops.target_is_tpu)
    import os
    prev = os.environ.get("RENDERLOOM_TARGET_PLATFORM")
    os.environ["RENDERLOOM_TARGET_PLATFORM"] = platforms[0]
    try:
        exported = jexport.export(serve, platforms=list(platforms))(*specs)
    finally:
        if prev is None:
            os.environ.pop("RENDERLOOM_TARGET_PLATFORM", None)
        else:
            os.environ["RENDERLOOM_TARGET_PLATFORM"] = prev
    L = (keyframes - 1) * rate + 1
    meta = {"format": "renderloom-pipeline", "version": 1,
            "n_clips": n_clips, "keyframes": keyframes, "rate": rate,
            "frames_out": L, "height": height, "width": width,
            "platforms": list(platforms),
            "src_size": list(src_size) if src_size is not None else None,
            "inputs": {"motion": [n_clips, 19, 2, keyframes],
                       "conf": [n_clips, 19, 1, keyframes],
                       "keys": [n_clips, keyframes, in_h, in_w, 3]},
            "output": [n_clips, L, height, width, 3]}
    return exported, meta


def save_exported(path: str, exported: jexport.Exported,
                  meta: Dict[str, Any]) -> int:
    """Write the single-file artifact; returns bytes written."""
    header = json.dumps(meta).encode("utf-8")
    payload = bytes(exported.serialize())
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(header)))
        f.write(header)
        f.write(payload)
    return len(_MAGIC) + 4 + len(header) + len(payload)


def load_exported(path: str) -> Tuple[Callable, Dict[str, Any]]:
    """Load an artifact → ``(serve, meta)``.

    ``serve(motion, conf, keys) -> (fused, sync)`` runs the frozen
    program on the current backend (which must be one of
    ``meta['platforms']``) — no renderloom model code, configs, or
    checkpoints are touched.
    """
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not a renderloom export "
                             f"(magic {magic!r})")
        (hlen,) = struct.unpack("<I", f.read(4))
        meta = json.loads(f.read(hlen).decode("utf-8"))
        exported = jexport.deserialize(bytearray(f.read()))
    return exported.call, meta
