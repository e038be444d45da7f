"""Batched-serving batch planner.

The e2e serving pipeline (scripts/serving_e2e_tpu.py — the batched
form of the reference's per-video test loop,
``Pose_Guided_Neural_Rendering/models/evaluator.py:48-147``) compiles one XLA
program per clip-batch size, and measured throughput is not guaranteed
monotone in the batch size: on round-3's stack the 2-clip program sat
in an XLA remat valley (82.5 f/s vs 86.5 at 1 clip; the round-4 stack
lifted it out — 147.0 vs 104.8 — but nothing pins future programs out
of such valleys).  Rather than hand-tuning every program out of its valley,
the serving layer plans each request as a multiset of PROFILED batch
sizes — running a request of 2 as two 1-clip programs, or padding 6
clips into the 8-clip program when that is measured faster than any
exact split — which makes served throughput monotone in the request
size by construction and reuses only compiled-and-measured programs.
"""

from __future__ import annotations

from typing import Dict, List, Tuple


def plan_chunks(n: int, times_ms: Dict[int, float]) -> List[int]:
    """Cheapest multiset of profiled batch sizes covering ``n`` clips.

    ``times_ms`` maps batch size → measured ms per batch of that size.
    Exact dynamic program over cost(r) = min_s times[s] + cost(r − s)
    (sizes may repeat; a chunk may overshoot the remainder — the extra
    slots run padding clips, which is frequently optimal: e.g. with the
    round-3 table {1: 335, 2: 703, 4: 1089, 8: 1452}, n=6 plans [8] at
    1452 ms, beating the exact split [4, 1, 1] at 1759 ms, and n=2
    plans [1, 1] at 670 ms, beating the valley program's 703 ms).
    Returns chunk sizes, largest first."""
    if n <= 0:
        return []
    sizes = sorted(times_ms)
    if not sizes:
        raise ValueError("empty serving profile")
    best: List[Tuple[float, List[int]]] = [(0.0, [])]
    for r in range(1, n + 1):
        cand = min(
            ((times_ms[s] + best[max(0, r - s)][0], s) for s in sizes),
            key=lambda c: (c[0], -c[1]))
        cost, s = cand
        best.append((cost, best[max(0, r - s)][1] + [s]))
    return sorted(best[n][1], reverse=True)


def planned_ms(n: int, times_ms: Dict[int, float]) -> float:
    """Total planned ms for ``n`` clips under :func:`plan_chunks`."""
    return sum(times_ms[s] for s in plan_chunks(n, times_ms))
