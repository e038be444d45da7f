"""Learning-rate policies.

Ports of the reference's epoch-level schedulers
(``Human_Motion_Modelling/models/trainer.py:17-38``), expressed as pure
``epoch -> multiplier`` functions composed into per-step optax schedules.
``plateau`` (metric-driven, stateful) lives host-side as
:class:`ReduceOnPlateau` — the jitted step consumes its multiplier as a
scalar input rather than baking it into the compiled schedule.
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


class ReduceOnPlateau:
    """Host-side plateau policy (the reference's ``lr_policy: plateau``,
    ``trainer.py:33-35``: torch ``ReduceLROnPlateau(mode='min',
    factor=0.5, threshold=0.01, patience=5)``).

    Call :meth:`update` with the monitored metric once per epoch; read
    :attr:`multiplier` and feed it to the train step (e.g. via
    ``optax.scale_by_schedule`` on a host-updated scalar or by rebuilding
    the optimizer — it changes at most once per ``patience`` epochs)."""

    def __init__(self, factor: float = 0.5, patience: int = 5,
                 threshold: float = 0.01, min_mult: float = 1e-4):
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_mult = min_mult
        self.multiplier = 1.0
        self.best = float("inf")
        self._bad_epochs = 0

    def update(self, metric: float) -> float:
        # torch's rel-threshold mode: improvement = best * (1 - threshold)
        if metric < self.best * (1.0 - self.threshold):
            self.best = float(metric)
            self._bad_epochs = 0
        else:
            self._bad_epochs += 1
            if self._bad_epochs > self.patience:
                self.multiplier = max(self.multiplier * self.factor,
                                      self.min_mult)
                self._bad_epochs = 0
        return self.multiplier


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
