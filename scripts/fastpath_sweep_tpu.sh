#!/bin/sh
# Serialized TPU measurement sweep for the parity-layout fast path.
# Run when the axon tunnel is up; one job at a time (two TPU processes
# poison each other's timings — CLAUDE.md).
set -x
cd "$(dirname "$0")/.." || exit 1
timeout 1200 python scripts/parity_conv_micro_tpu.py
timeout 1200 python scripts/norm_micro_tpu.py
RENDERLOOM_PALLAS_NORM=0 timeout 1200 python scripts/fastgen_tpu.py
timeout 1200 python scripts/fastgen_tpu.py
timeout 1800 env BENCH_METRIC=e2e python bench.py
timeout 1800 env BENCH_METRIC=gan_train python bench.py
