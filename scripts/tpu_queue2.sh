#!/bin/sh
# Retry queue (round 4): re-runs of measurements whose first capture
# was invalid — the parity-conv/norm micros crashed or silently timed
# fp32 (fixed bf16 carries), the raster sweep overlapped host CPU work
# on this 1-core host, and the Pallas-norm fastgen row needs the fixed
# (lane-rotation) parity kernel.  Run ONLY after scripts/tpu_queue.sh
# has finished (one TPU process at a time).
set -x
cd "$(dirname "$0")/.." || exit 1
stamp() { date -u +%FT%TZ; }

echo "queue2 start $(stamp)" > /tmp/q2_status.log
timeout 1200 python scripts/parity_conv_micro_tpu.py > /tmp/q2_parityconv.log 2>&1
echo "parityconv rc=$? $(stamp)" >> /tmp/q2_status.log
timeout 1200 python scripts/norm_micro_tpu.py > /tmp/q2_normmicro.log 2>&1
echo "normmicro rc=$? $(stamp)" >> /tmp/q2_status.log
timeout 1800 python scripts/validate_pallas_tpu.py > /tmp/q2_raster.log 2>&1
echo "raster rc=$? $(stamp)" >> /tmp/q2_status.log
RENDERLOOM_PALLAS_NORM=1 timeout 1800 python scripts/fastgen_tpu.py > /tmp/q2_fastgen_pallas.log 2>&1
echo "fastgen_pallas rc=$? $(stamp)" >> /tmp/q2_status.log
echo "queue2 done $(stamp)" >> /tmp/q2_status.log
