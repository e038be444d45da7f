"""Learning-rate policies.

Ports of the reference's epoch-level schedulers
(``Human_Motion_Modelling/models/trainer.py:17-38``), expressed as pure
``epoch -> multiplier`` functions composed into per-step optax schedules.
``plateau`` is intentionally not carried over (stateful, metric-driven —
none of the shipped configs use it).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def lr_multiplier(policy: str, gamma: float = 0.5, step_size: int = 100,
                  warmup: int = 5) -> Callable[[int], float]:
    """Epoch → LR multiplier for the named policy (jit-safe: ``epoch``
    may be a traced integer)."""
    if policy == "constant":
        return lambda epoch: jnp.asarray(1.0)
    if policy == "lambda":
        # Noam-style warmup (trainer.py:21-25)
        return lambda epoch: jnp.minimum(
            (epoch + 1.0) ** -0.5, (epoch + 1.0) * warmup ** -1.5)
    if policy == "step":
        return lambda epoch: gamma ** (epoch // step_size)
    if policy == "multistep":
        milestones = (step_size, step_size + step_size // 2,
                      step_size + step_size // 2 + step_size // 4)
        return lambda epoch: gamma ** sum(
            (epoch >= m).astype(jnp.float32) if hasattr(epoch, "dtype")
            else float(epoch >= m) for m in milestones)
    raise ValueError(f"unknown lr policy {policy!r}")


def step_schedule(base_lr: float, policy: str, steps_per_epoch: int,
                  gamma: float = 0.5, step_size: int = 100,
                  warmup: int = 5) -> Callable[[int], float]:
    """Per-step optax schedule applying the epoch policy.

    jit-safe: the multiplier is evaluated with traced integer arithmetic
    for ``step``/``multistep``/``constant``; ``lambda`` uses float ops.
    """
    mult = lr_multiplier(policy, gamma, step_size, warmup)

    def schedule(count):
        epoch = count // steps_per_epoch
        return base_lr * mult(epoch)

    return schedule
