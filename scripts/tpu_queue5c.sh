#!/bin/sh
# Round-5 third serialized TPU queue: everything gated on the VMEM-cap
# fix (477d6c4) plus the re-measures the queue-5b crash blocked.
# Run AFTER the 3000-step GAN demo releases the chip.  One TPU process
# at a time; logs /tmp/q5c_*.log, stamps /tmp/q5c_status.log.
set -x
cd "$(dirname "$0")/.."

stamp() { echo "$1 rc=$2 $(date -u +%FT%TZ)" >> /tmp/q5c_status.log; }

echo "queue5c start $(date -u +%FT%TZ)" >> /tmp/q5c_status.log

# 1. Batched serving + planner + disk-resolution ingest in situ, under
# the VMEM-capped Pallas parity norm (the queue-5b run died at clips=2).
timeout 4500 python scripts/serving_e2e_tpu.py \
    > /tmp/q5c_serving.log 2>&1; stamp serving $?

# 2. Driver-protocol e2e bench: the VMEM cap retiles the deep-trunk
# norms (2400->1200 rows at C=512) — re-confirm the 127.7 f/s headline.
BENCH_METRIC=e2e timeout 3600 python bench.py \
    > /tmp/q5c_bench_e2e.log 2>&1; stamp bench_e2e $?

# 3. prepare_batch bisect: disk-size ingest now rides the separable MXU
# resize (12dd14f) — re-measure the 153.66 ms/clip row.
timeout 3600 python scripts/prep_bisect_tpu.py \
    > /tmp/q5c_prep.log 2>&1; stamp prep $?

# 4. StableHLO artifact: re-export under the VMEM cap (CPU phase), then
# serve + honest drift (the q5b drift number compared mismatched inputs).
JAX_PLATFORMS=cpu timeout 2400 python scripts/export_serve_tpu.py \
    export /tmp/q5c_pipeline.rlx > /tmp/q5c_export.log 2>&1; stamp export $?
timeout 2400 python scripts/export_serve_tpu.py serve /tmp/q5c_pipeline.rlx \
    >> /tmp/q5c_export.log 2>&1; stamp serve $?

echo "queue5c done $(date -u +%FT%TZ)" >> /tmp/q5c_status.log
