"""PRNG plumbing helpers.

All randomness flows from a single seed through ``jax.random`` key folds;
there is no global RNG state (contrast the reference's mix of ``random``,
``np.random`` and ``torch`` seeds at ``Human_Motion_Modelling/train.py`` and
worker-seeded loaders at ``utils/utils.py:12-18``).
"""

from __future__ import annotations

import jax


def key_for_step(base: jax.Array, step) -> jax.Array:
    """Derive the step-local key; safe inside jit (step may be traced)."""
    return jax.random.fold_in(base, step)


def split_tree(key: jax.Array, names: tuple) -> dict:
    """Split ``key`` into a dict of named keys (stable order)."""
    keys = jax.random.split(key, len(names))
    return {name: keys[i] for i, name in enumerate(names)}
