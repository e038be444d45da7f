#!/bin/sh
# Round-5 serialized TPU queue (one TPU process at a time; logs under
# /tmp/q5_*.log, stamps in /tmp/q5_status.log).  Order: the regression
# fix evidence first, then the serving-stack re-measures that depend on
# the new defaults, then the long demos.
set -x
cd "$(dirname "$0")/.."

stamp() { echo "$1 rc=$2 $(date -u +%FT%TZ)" >> /tmp/q5_status.log; }

echo "queue5 start $(date -u +%FT%TZ)" >> /tmp/q5_status.log

# 1. driver-protocol benches (fast path + pallas parity norms default
# + the r3centered bf16 norm dispatch)
BENCH_METRIC=gan_train timeout 3600 python bench.py \
    > /tmp/q5_bench_gan.log 2>&1; stamp bench_gan $?
BENCH_METRIC=e2e timeout 3600 python bench.py \
    > /tmp/q5_bench_e2e.log 2>&1; stamp bench_e2e $?

# 2. GAN train frontier at the fixed norm: reference B=4 + scaling.
# B=12/16 (both remat settings) already hard-failed in the remote
# compiler (HTTP 500 tpu_compile_helper crash, all 4 server instances,
# /tmp/q5_precompile_frontier.log) — B=10 tightens the bound instead.
timeout 5400 python scripts/gan_cost_tpu.py 4 4:0 8:0 8:1 10:0 \
    > /tmp/q5_gancost.log 2>&1; stamp gancost $?

# 3. stage breakdown + prep bisect (incl. the 768x512 ingest path)
timeout 3600 python scripts/profile_e2e_tpu.py \
    > /tmp/q5_profile.log 2>&1; stamp profile $?
timeout 3600 python scripts/prep_bisect_tpu.py \
    > /tmp/q5_prep.log 2>&1; stamp prep $?

# 4. fast-generator sweep under the new norm default
timeout 3600 python scripts/fastgen_tpu.py \
    > /tmp/q5_fastgen.log 2>&1; stamp fastgen $?

# 5. batched serving + planner
timeout 5400 python scripts/serving_e2e_tpu.py \
    > /tmp/q5_serving.log 2>&1; stamp serving $?

# 6. StableHLO artifact: CPU-host export, TPU serve
JAX_PLATFORMS=cpu timeout 3600 python scripts/export_serve_tpu.py \
    export /tmp/q5_pipeline.rlx > /tmp/q5_export.log 2>&1; stamp export $?
timeout 3600 python scripts/export_serve_tpu.py serve /tmp/q5_pipeline.rlx \
    >> /tmp/q5_export.log 2>&1; stamp serve $?

# 7. GAN demo with the ssim term — both oracle metrics must win
timeout 10800 python scripts/train_eval_tpu_demo.py 3000 \
    > /tmp/q5_gan_demo.log 2>&1; stamp gan_demo $?



# 8. pose head on the 12-subject set (held-out-subject protocol)
timeout 14400 python scripts/pose_quality_tpu.py 60 \
    > /tmp/q5_pose.log 2>&1; stamp pose $?

echo "queue5 done $(date -u +%FT%TZ)" >> /tmp/q5_status.log
