#!/bin/sh
# Takes over from tpu_queue3.sh after its gan benches: adds the in-situ
# fast-vs-standard e2e A/B (82.3 f/s with the fast path vs the 86.8
# pre-fastpath round-3 headline says the isolated 1.69x generator win
# may not survive inside the rollout scan — VERDICT #1 wants the
# defaults picked by THIS data, not the micro), then continues the
# VERDICT punch list.  One TPU process at a time.
set -x
cd "$(dirname "$0")/.." || exit 1
stamp() { date -u +%FT%TZ; }

echo "queue4 start $(stamp)" > /tmp/q4_status.log
# code-vs-environment drift A/B: the EXACT round-3 commit (89d3c7c,
# the 7.09 w/s capture) rerun today from a worktree.  If it also reads
# ~5.6, the 21% B=4 gap is terminal/toolchain drift, not a renderloom
# regression; if it reads ~7, the regression is in our diff since.
if [ -d /tmp/r3bench ]; then
  (cd /tmp/r3bench && BENCH_METRIC=gan_train timeout 2400 python bench.py) > /tmp/q4_r3_gan.log 2>&1
  echo "r3_gan rc=$? $(stamp)" >> /tmp/q4_status.log
fi
RENDERLOOM_FASTPATH=0 BENCH_METRIC=e2e timeout 3600 python bench.py > /tmp/q4_bench_e2e_std.log 2>&1
echo "bench_e2e_std rc=$? $(stamp)" >> /tmp/q4_status.log
timeout 3600 python scripts/serving_e2e_tpu.py > /tmp/q4_serving.log 2>&1
echo "serving rc=$? $(stamp)" >> /tmp/q4_status.log
timeout 3600 python scripts/gan_cost_tpu.py > /tmp/q4_gancost.log 2>&1
echo "gancost rc=$? $(stamp)" >> /tmp/q4_status.log

timeout 5400 python scripts/motion_train_tpu_demo.py 20000 > /tmp/q4_motion_demo.log 2>&1
echo "motion_demo rc=$? $(stamp)" >> /tmp/q4_status.log
timeout 7200 python scripts/train_eval_tpu_demo.py 2000 > /tmp/q4_gan_demo.log 2>&1
echo "gan_demo rc=$? $(stamp)" >> /tmp/q4_status.log

timeout 2400 python scripts/pose_quality_tpu.py 60 > /tmp/q4_pose.log 2>&1
echo "pose rc=$? $(stamp)" >> /tmp/q4_status.log
timeout 1200 python scripts/parity_conv_micro_tpu.py > /tmp/q4_parityconv.log 2>&1
echo "parityconv rc=$? $(stamp)" >> /tmp/q4_status.log
timeout 1200 python scripts/norm_micro_tpu.py > /tmp/q4_normmicro.log 2>&1
echo "normmicro rc=$? $(stamp)" >> /tmp/q4_status.log
timeout 1800 python scripts/validate_pallas_tpu.py > /tmp/q4_raster.log 2>&1
echo "raster rc=$? $(stamp)" >> /tmp/q4_status.log
echo "queue4 done $(stamp)" >> /tmp/q4_status.log
