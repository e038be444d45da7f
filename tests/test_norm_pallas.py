"""Fused Pallas instance norm == the XLA reference implementations
(layers.instance_norm / fastpath.instance_norm_p4), with and without
affine, parity statistics, and fused leaky."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from renderloom.models.fastpath import instance_norm_p4
from renderloom.models.layers import LEAKY_SLOPE, instance_norm, leaky
from renderloom.ops.norm_pallas import instance_norm_fused


def _x(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape),
                       jnp.float32)


def test_plain_matches():
    x = _x((2, 8, 12, 5))
    got = instance_norm_fused(x, interpret=True)
    np.testing.assert_allclose(got, instance_norm(x), atol=1e-5)


def test_affine_leaky_matches():
    x = _x((2, 8, 12, 6), 1)
    s = _x((6,), 2) + 2.0
    b = _x((6,), 3)
    got = instance_norm_fused(x, s, b, slope=LEAKY_SLOPE, interpret=True)
    ref = leaky(instance_norm(x, scale=s, bias=b))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_parity_matches():
    x = _x((2, 4, 6, 16), 4)
    s = _x((16,), 5) + 2.0
    b = _x((16,), 6)
    got = instance_norm_fused(x, s, b, parity=True, slope=LEAKY_SLOPE,
                              interpret=True)
    ref = leaky(instance_norm_p4(x, s, b))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_no_tile_raises():
    with pytest.raises(ValueError):
        instance_norm_fused(_x((1, 1, 7, 4)), interpret=True)


def test_vmem_cap_splits_large_c_tiles():
    """The queue-5b serving crash shape: (B, 60, 40, 512) f32 — a single
    2400-row tile at C=512 costs ~18.5 MB of scoped VMEM (> the 16 MB
    hardware limit).  The cap must split the tile AND keep the result
    exact (multi-tile accumulation path)."""
    from renderloom.ops.norm_pallas import _pick_tile, _vmem_tile_cap

    cap = _vmem_tile_cap(512, 8)
    assert cap < 2400, cap
    tile = _pick_tile(2400, 8, min(4096, cap))
    assert 0 < tile < 2400 and 2400 % tile == 0
    # 16 B/elem budget model stays under 12 MB
    assert tile * 512 * 16 <= 12 * 2**20

    x = _x((2, 60, 40, 512), 7)
    s = _x((512,), 8) + 2.0
    b = _x((512,), 9)
    got = instance_norm_fused(x, s, b, parity=True, slope=LEAKY_SLOPE,
                              interpret=True)
    ref = leaky(instance_norm_p4(x, s, b))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_small_c_keeps_wide_tiles():
    """Low-channel shapes (the packed 88-channel label path where the
    kernel's win was measured) must keep the 4096-row cap."""
    from renderloom.ops.norm_pallas import _vmem_tile_cap

    assert _vmem_tile_cap(88, 8) >= 4096
    assert _vmem_tile_cap(128, 16) >= 4096


def test_batch_gate_default(monkeypatch):
    """Round-5 serving A/B (queue-5c Pallas vs queue-5e XLA, same
    commit): the kernel wins single-clip programs (B=7: 133.0 vs
    105.5 f/s) and loses batched ones (B=14+: 143.4 vs 147.9 at
    clips=2, 163.2 vs 170.5 at clips=8) — the default dispatch keys on
    segment batch."""
    import renderloom.ops
    from renderloom.models import fastpath

    monkeypatch.delenv("RENDERLOOM_PALLAS_NORM", raising=False)
    # use_pallas_norm resolves target_is_tpu from renderloom.ops at
    # call time — patch it there to simulate a TPU target on the CPU
    # test host (backend stays 'cpu', so the ≤7 case takes the
    # cross-host-export branch and returns True without the probe)
    monkeypatch.setattr(renderloom.ops, "target_is_tpu", lambda: True)
    assert fastpath.use_pallas_norm(parity=True, batch=7)
    assert fastpath.use_pallas_norm(parity=True)  # no batch: trust it
    assert not fastpath.use_pallas_norm(parity=True, batch=14)
    assert not fastpath.use_pallas_norm(parity=True, batch=8)
    assert not fastpath.use_pallas_norm(parity=False, batch=1)
    # env override ignores the gate
    monkeypatch.setenv("RENDERLOOM_PALLAS_NORM", "1")
    assert fastpath.use_pallas_norm(parity=True, batch=64)
    monkeypatch.setenv("RENDERLOOM_PALLAS_NORM", "0")
    assert not fastpath.use_pallas_norm(parity=True, batch=1)
    # threshold is env-tunable
    monkeypatch.delenv("RENDERLOOM_PALLAS_NORM")
    monkeypatch.setenv("RENDERLOOM_PALLAS_NORM_MAX_B", "16")
    assert fastpath._pallas_norm_max_batch() == 16
