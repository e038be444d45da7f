"""On-device ops: pose geometry, rasterizers, image ops, flow, spectral norm."""

from __future__ import annotations

import os


def target_is_tpu() -> bool:
    """Is the LOWERING target a TPU?

    Defaults to the current backend; ``RENDERLOOM_TARGET_PLATFORM``
    overrides it for cross-host export (`eval.export`): a TPU artifact
    traced on a CPU build host must lower the compiled Pallas kernels,
    not bake interpret mode (per-element HLO emulation) into the
    frozen program.
    """
    t = os.environ.get("RENDERLOOM_TARGET_PLATFORM")
    if t:
        return t.lower() == "tpu"
    import jax
    return jax.default_backend() == "tpu"
