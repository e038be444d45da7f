"""Mesh + sharding helpers for data-parallel training.

The reference trains on exactly one GPU (SURVEY.md §2.5); renderloom's train
steps are written against a ``jax.sharding.Mesh`` with a ``data`` axis:
batches are sharded over ``data``, parameters/optimizer state replicated,
and XLA inserts the gradient ``psum`` automatically from the sharding
annotations.  The same step function runs on 1 chip (trivial mesh) or a pod
slice over ICI.  A ``model`` axis is reserved for tensor-sharding large
towers later.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              data: Optional[int] = None, model: int = 1) -> Mesh:
    """Build a ``(data, model)`` mesh covering ``devices``.

    Defaults to all addressable devices on the ``data`` axis.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(
            f"mesh {data}x{model} does not cover {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a host batch pytree with axis 0 sharded over ``data``."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Device-put a pytree fully replicated over the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def process_shard(n: int, process_index: Optional[int] = None,
                  process_count: Optional[int] = None) -> np.ndarray:
    """Indices [0, n) owned by this host for multi-host input pipelines.

    Each process reads a disjoint strided slice of the global sample
    order (same seed everywhere → same permutation → disjoint coverage);
    per-process batch size is ``global_batch // process_count``.  On a
    single host this is the identity."""
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    return np.arange(process_index, n, process_count)


def shard_params_tp(mesh: Mesh, tree: Any,
                    min_elems: int = 1 << 14) -> Any:
    """Tensor-shard a parameter pytree over the ``model`` axis.

    Conv kernels (HWIO) and dense kernels (IO) with an output-channel
    dim divisible by the model-axis size and at least ``min_elems``
    elements are partitioned on their last (output-channel) axis; all
    other leaves (biases, norms, spectral-norm ``u`` vectors, optimizer
    scalars) stay replicated.  Under ``jit`` XLA's SPMD partitioner then
    propagates the channel sharding through the convs and inserts the
    ICI collectives (all-gather on activations / reduce-scatter on
    grads) automatically — no hand-written collectives, per the
    scaling-book recipe.  With ``model=1`` this is a no-op layout."""
    size = mesh.shape[MODEL_AXIS]

    def put(x):
        if (size > 1 and hasattr(x, "ndim") and x.ndim >= 2
                and x.size >= min_elems and x.shape[-1] % size == 0):
            spec = P(*([None] * (x.ndim - 1) + [MODEL_AXIS]))
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, replicated_sharding(mesh))

    return jax.tree.map(put, tree)
