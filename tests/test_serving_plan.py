"""Serving batch planner: monotone throughput from a non-monotone
program profile (the round-3 N=2 remat valley, BASELINE.md)."""

import pytest

from renderloom.utils.serving import plan_chunks, planned_ms

# round-3 measured serving table (scripts/serving_e2e_tpu.py)
R3 = {1: 335.0, 2: 703.0, 4: 1089.0, 8: 1452.0}


def test_valley_avoided():
    # two 1-clip programs beat the remat-valley 2-clip program
    assert plan_chunks(2, R3) == [1, 1]
    assert planned_ms(2, R3) == 670.0


def test_overshoot_pad():
    # 6 clips pad into the 8-clip program (1452 < [4,1,1] = 1759)
    assert plan_chunks(6, R3) == [8]


def test_exact_sizes_kept():
    assert plan_chunks(1, R3) == [1]
    assert plan_chunks(4, R3) == [4]
    assert plan_chunks(8, R3) == [8]


def test_large_request_composes():
    plan = plan_chunks(20, R3)
    assert sum(plan) >= 20
    assert all(s in R3 for s in plan)
    # composing 8s dominates: [8, 8, 4]
    assert plan == [8, 8, 4]


def test_monotone_throughput():
    # planned ms non-decreasing in n, fps never below the single-clip
    # baseline (the DP can always fall back to singles), and fps
    # monotone across the PROFILED sizes — the serving-table property
    # VERDICT r3 #7 asks for (a user scaling 1→2 clips must not lose
    # throughput; between profiled sizes a dip vs the previous n is
    # inherent to chunking, e.g. n=5 = [4, 1])
    fps1 = 1.0 / planned_ms(1, R3)
    prev_ms = 0.0
    for n in range(1, 17):
        ms = planned_ms(n, R3)
        assert ms >= prev_ms
        assert n / ms >= fps1 * 0.999
        prev_ms = ms
    prof_fps = [n / planned_ms(n, R3) for n in sorted(R3)]
    assert prof_fps == sorted(prof_fps)


def test_edge_cases():
    assert plan_chunks(0, R3) == []
    with pytest.raises(ValueError):
        plan_chunks(3, {})
