#!/bin/sh
# Full serialized TPU job queue for round 4 (VERDICT r3 punch list).
# One TPU process at a time (two poison each other's timings —
# CLAUDE.md).  Ordered so the driver-critical evidence lands first:
#  1. fast-path sweep (parity conv A/B, norm micro, fastgen ± Pallas
#     norm) — VERDICT #1
#  2. bench e2e + gan_train JSON captures — VERDICT #2
#  3. e2e stage breakdown (packed-label raster effect) — VERDICT #4
#  4. serving monotonicity with the batch planner — VERDICT #7
#  5. GAN batch-scaling incl. the unresolved B=16+remat row — VERDICT #6
#  6. pose-head hardening eval — VERDICT #8
#  7. learning demos at scale (longest; queue last) — VERDICT #5
# Logs land in /tmp/q_*.log; JSON artifacts where each script writes.
set -x
cd "$(dirname "$0")/.." || exit 1
stamp() { date -u +%FT%TZ; }

echo "queue start $(stamp)" > /tmp/q_status.log
timeout 1200 python scripts/parity_conv_micro_tpu.py > /tmp/q_parityconv.log 2>&1
echo "parityconv rc=$? $(stamp)" >> /tmp/q_status.log
timeout 1200 python scripts/norm_micro_tpu.py > /tmp/q_normmicro.log 2>&1
echo "normmicro rc=$? $(stamp)" >> /tmp/q_status.log
timeout 1800 python scripts/validate_pallas_tpu.py > /tmp/q_raster.log 2>&1
echo "raster rc=$? $(stamp)" >> /tmp/q_status.log
RENDERLOOM_PALLAS_NORM=0 timeout 1800 python scripts/fastgen_tpu.py > /tmp/q_fastgen_xla.log 2>&1
echo "fastgen_xla rc=$? $(stamp)" >> /tmp/q_status.log
timeout 1800 python scripts/fastgen_tpu.py > /tmp/q_fastgen.log 2>&1
echo "fastgen rc=$? $(stamp)" >> /tmp/q_status.log

BENCH_METRIC=e2e timeout 1800 python bench.py > /tmp/q_bench_e2e.log 2>&1
echo "bench_e2e rc=$? $(stamp)" >> /tmp/q_status.log
BENCH_METRIC=gan_train timeout 1800 python bench.py > /tmp/q_bench_gan.log 2>&1
echo "bench_gan rc=$? $(stamp)" >> /tmp/q_status.log

timeout 1800 python scripts/profile_e2e_tpu.py > /tmp/q_profile.log 2>&1
echo "profile rc=$? $(stamp)" >> /tmp/q_status.log
timeout 2400 python scripts/serving_e2e_tpu.py > /tmp/q_serving.log 2>&1
echo "serving rc=$? $(stamp)" >> /tmp/q_status.log
timeout 3600 python scripts/gan_cost_tpu.py > /tmp/q_gancost.log 2>&1
echo "gancost rc=$? $(stamp)" >> /tmp/q_status.log
timeout 2400 python scripts/pose_quality_tpu.py 60 > /tmp/q_pose.log 2>&1
echo "pose rc=$? $(stamp)" >> /tmp/q_status.log

timeout 5400 python scripts/motion_train_tpu_demo.py 20000 > /tmp/q_motion_demo.log 2>&1
echo "motion_demo rc=$? $(stamp)" >> /tmp/q_status.log
timeout 7200 python scripts/train_eval_tpu_demo.py 2000 > /tmp/q_gan_demo.log 2>&1
echo "gan_demo rc=$? $(stamp)" >> /tmp/q_status.log
echo "queue done $(stamp)" >> /tmp/q_status.log
