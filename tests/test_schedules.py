"""LR policies vs the reference's scheduler semantics
(``Human_Motion_Modelling/models/trainer.py:17-38``)."""

import numpy as np
import pytest

from renderloom.train.schedules import (ReduceOnPlateau, lr_multiplier,
                                        step_schedule)


def test_constant():
    m = lr_multiplier("constant")
    assert float(m(0)) == 1.0 and float(m(500)) == 1.0


def test_step_halves_every_step_size():
    m = lr_multiplier("step", gamma=0.5, step_size=100)
    assert float(m(0)) == 1.0
    assert float(m(99)) == 1.0
    assert float(m(100)) == 0.5
    assert float(m(250)) == 0.25


def test_lambda_warmup_peaks_then_decays():
    m = lr_multiplier("lambda", warmup=5)
    vals = [float(m(e)) for e in range(30)]
    peak = int(np.argmax(vals))
    assert 3 <= peak <= 6
    assert vals[-1] < vals[peak]


def test_multistep_monotone_decreasing():
    m = lr_multiplier("multistep", gamma=0.5, step_size=100)
    vals = [float(m(e)) for e in (0, 120, 160, 190, 400)]
    assert vals[0] == 1.0
    assert all(a >= b for a, b in zip(vals, vals[1:]))
    assert vals[-1] == pytest.approx(0.125)


def test_unknown_policy_raises():
    with pytest.raises(ValueError):
        lr_multiplier("cosine")


def test_step_schedule_epoch_granularity():
    s = step_schedule(1e-3, "step", steps_per_epoch=10, gamma=0.5,
                      step_size=2)
    assert float(s(0)) == pytest.approx(1e-3)
    assert float(s(19)) == pytest.approx(1e-3)
    assert float(s(20)) == pytest.approx(5e-4)


def test_plateau_reduces_after_patience():
    p = ReduceOnPlateau(factor=0.5, patience=2, threshold=0.01)
    assert p.update(1.0) == 1.0           # first metric = new best
    assert p.update(0.5) == 1.0           # improvement
    # stall: patience 2 → reduce on the 3rd bad epoch
    assert p.update(0.5) == 1.0
    assert p.update(0.5) == 1.0
    assert p.update(0.5) == 0.5
    # counter reset: another stall takes 3 more bad epochs
    assert p.update(0.5) == 0.5
    assert p.update(0.5) == 0.5
    assert p.update(0.5) == 0.25


def test_plateau_relative_threshold():
    p = ReduceOnPlateau(factor=0.5, patience=0, threshold=0.1)
    p.update(1.0)
    # 0.95 is NOT a >10% relative improvement → bad epoch → reduce
    assert p.update(0.95) == 0.5
    # 0.5 IS an improvement → best updates, no further reduction
    assert p.update(0.5) == 0.5


def test_plateau_min_multiplier_floor():
    p = ReduceOnPlateau(factor=0.1, patience=0, min_mult=1e-3)
    p.update(1.0)
    for _ in range(10):
        p.update(2.0)
    assert p.multiplier == pytest.approx(1e-3)
