#!/bin/sh
# Round-4 continuation queue: the 2026-08-19 03:24 queue run left
# bench e2e timed out at 30 min (cold remote compile after the
# packed=2/maskless changes invalidated the persistent cache, plus a
# concurrent pytest stole the single host core) and everything after
# bench_gan unrun.  This queue front-loads the driver-critical e2e
# capture with a 90-min bound and NO concurrent host work, re-captures
# it warm, then works down the VERDICT punch list.  One TPU process at
# a time (CLAUDE.md).  Logs: /tmp/q3_*.log; status: /tmp/q3_status.log.
set -x
cd "$(dirname "$0")/.." || exit 1
stamp() { date -u +%FT%TZ; }

echo "queue3 start $(stamp)" > /tmp/q3_status.log
BENCH_METRIC=e2e timeout 5400 python bench.py > /tmp/q3_bench_e2e_cold.log 2>&1
echo "bench_e2e_cold rc=$? $(stamp)" >> /tmp/q3_status.log
BENCH_METRIC=e2e timeout 1800 python bench.py > /tmp/q3_bench_e2e.log 2>&1
echo "bench_e2e rc=$? $(stamp)" >> /tmp/q3_status.log
BENCH_METRIC=gan_train timeout 2400 python bench.py > /tmp/q3_bench_gan.log 2>&1
echo "bench_gan rc=$? $(stamp)" >> /tmp/q3_status.log
BENCH_GAN_BATCH=8 BENCH_METRIC=gan_train timeout 2400 python bench.py > /tmp/q3_bench_gan8.log 2>&1
echo "bench_gan8 rc=$? $(stamp)" >> /tmp/q3_status.log

timeout 2400 python scripts/profile_e2e_tpu.py > /tmp/q3_profile.log 2>&1
echo "profile rc=$? $(stamp)" >> /tmp/q3_status.log
timeout 3600 python scripts/serving_e2e_tpu.py > /tmp/q3_serving.log 2>&1
echo "serving rc=$? $(stamp)" >> /tmp/q3_status.log
timeout 3600 python scripts/gan_cost_tpu.py > /tmp/q3_gancost.log 2>&1
echo "gancost rc=$? $(stamp)" >> /tmp/q3_status.log

# queue2 retries (first captures were invalid — fixed carries/kernel)
timeout 1200 python scripts/parity_conv_micro_tpu.py > /tmp/q3_parityconv.log 2>&1
echo "parityconv rc=$? $(stamp)" >> /tmp/q3_status.log
timeout 1200 python scripts/norm_micro_tpu.py > /tmp/q3_normmicro.log 2>&1
echo "normmicro rc=$? $(stamp)" >> /tmp/q3_status.log
timeout 1800 python scripts/validate_pallas_tpu.py > /tmp/q3_raster.log 2>&1
echo "raster rc=$? $(stamp)" >> /tmp/q3_status.log
RENDERLOOM_PALLAS_NORM=1 timeout 1800 python scripts/fastgen_tpu.py > /tmp/q3_fastgen_pallas.log 2>&1
echo "fastgen_pallas rc=$? $(stamp)" >> /tmp/q3_status.log

timeout 2400 python scripts/pose_quality_tpu.py 60 > /tmp/q3_pose.log 2>&1
echo "pose rc=$? $(stamp)" >> /tmp/q3_status.log

timeout 5400 python scripts/motion_train_tpu_demo.py 20000 > /tmp/q3_motion_demo.log 2>&1
echo "motion_demo rc=$? $(stamp)" >> /tmp/q3_status.log
timeout 7200 python scripts/train_eval_tpu_demo.py 2000 > /tmp/q3_gan_demo.log 2>&1
echo "gan_demo rc=$? $(stamp)" >> /tmp/q3_status.log
echo "queue3 done $(stamp)" >> /tmp/q3_status.log
