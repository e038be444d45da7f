"""Tensor-parallel param sharding: DP vs dp×tp parity on 8 CPU devices.

``shard_params_tp`` partitions conv/dense output channels over the
``model`` mesh axis; XLA SPMD must produce the same numbers as the
replicated layout (new capability — the reference is single-GPU,
SURVEY.md §2.5).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from renderloom.parallel import (make_mesh, replicate, shard_batch,
                                 shard_params_tp)


class SmallConvNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(32, (3, 3), padding="SAME")(x)
        x = nn.relu(x)
        x = nn.Conv(32, (3, 3), padding="SAME")(x)
        x = nn.relu(x)
        return nn.Conv(1, (1, 1))(x)


def test_tp_sharding_matches_replicated():
    model = SmallConvNet()
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 16, 4))
    params = model.init(jax.random.PRNGKey(1), x)

    @jax.jit
    def forward(p, x):
        return model.apply(p, x)

    mesh_dp = make_mesh()                       # 8x1
    out_dp = forward(replicate(mesh_dp, params),
                     shard_batch(mesh_dp, np.asarray(x)))

    mesh_tp = make_mesh(data=4, model=2)        # 4x2 hybrid
    p_tp = shard_params_tp(mesh_tp, params, min_elems=256)
    # the 3x3x4x32 and 3x3x32x32 kernels must actually be sharded
    k0 = p_tp["params"]["Conv_0"]["kernel"]
    assert not k0.sharding.is_fully_replicated
    out_tp = forward(p_tp, shard_batch(mesh_tp, np.asarray(x)))

    np.testing.assert_allclose(np.asarray(out_dp), np.asarray(out_tp),
                               rtol=1e-5, atol=1e-5)


def test_tp_small_leaves_stay_replicated():
    mesh = make_mesh(data=4, model=2)
    tree = {"big": jnp.ones((64, 64)), "bias": jnp.ones((32,)),
            "odd": jnp.ones((33, 33))}
    out = shard_params_tp(mesh, tree, min_elems=256)
    assert not out["big"].sharding.is_fully_replicated
    assert out["bias"].sharding.is_fully_replicated
    assert out["odd"].sharding.is_fully_replicated  # 33 % 2 != 0


def test_tp_noop_on_model1_mesh():
    mesh = make_mesh()  # model axis size 1
    tree = {"k": jnp.ones((64, 64))}
    out = shard_params_tp(mesh, tree)
    assert out["k"].sharding.is_fully_replicated


def test_process_shard_disjoint_and_complete():
    from renderloom.parallel import process_shard
    n, k = 23, 4
    slices = [process_shard(n, i, k) for i in range(k)]
    combined = np.sort(np.concatenate(slices))
    np.testing.assert_array_equal(combined, np.arange(n))
    for i in range(k):
        for j in range(i + 1, k):
            assert not set(slices[i]) & set(slices[j])


def test_process_shard_identity_single_host():
    from renderloom.parallel import process_shard
    np.testing.assert_array_equal(process_shard(10), np.arange(10))
