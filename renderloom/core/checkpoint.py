"""Orbax checkpointing: params + optimizer state + step + PRNG key.

The reference saves bare ``state_dict`` files named by epoch and parses the
resume epoch back out of the *filename*
(``Human_Motion_Modelling/models/trainer.py:73-79,208-225``); the renderer
deliberately drops optimizer state
(``Pose_Guided_Neural_Rendering/models/trainer.py:342-344``).  Here a
checkpoint is one orbax PyTree save holding everything needed for exact
resume: params, optimizer state, spectral-norm state, step counter and PRNG
key.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _abspath(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


def save_checkpoint(ckpt_dir: str, step: int, state: Any) -> str:
    """Save ``state`` (any pytree) under ``ckpt_dir/step_<N>``."""
    ckpt_dir = _abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"step_{step:08d}")
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)
    return path


def latest_step(ckpt_dir: str) -> Optional[int]:
    ckpt_dir = _abspath(ckpt_dir)
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("step_"):
            try:
                steps.append(int(name.split("_")[1]))
            except (IndexError, ValueError):
                continue
    return max(steps) if steps else None


def restore_checkpoint(ckpt_dir: str, step: Optional[int] = None,
                       target: Any = None) -> Any:
    """Restore the checkpoint at ``step`` (default: latest).

    ``target`` supplies the pytree structure/dtypes; when given, restored
    leaves are cast onto it so resume is exact regardless of how numpy
    round-tripped the dtypes.
    """
    ckpt_dir = _abspath(ckpt_dir)
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = os.path.join(ckpt_dir, f"step_{step:08d}")
    with ocp.PyTreeCheckpointer() as ckptr:
        if target is None:
            return ckptr.restore(path)
        restored = ckptr.restore(
            path, args=ocp.args.PyTreeRestore(item=jax.device_get(target)))
    return jax.tree.map(
        lambda t, r: np.asarray(r, dtype=np.asarray(t).dtype), target,
        restored)
