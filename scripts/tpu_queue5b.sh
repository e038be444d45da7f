#!/bin/sh
# Round-5 second serialized TPU queue: re-runs the queue-5 items whose
# results were stranded in /tmp when the host restarted (gancost retry,
# StableHLO export/serve on hardware, serving re-measure under the new
# norm defaults, the 3000-step GAN demo with the ssim term).  One TPU
# process at a time; logs /tmp/q5b_*.log, stamps /tmp/q5b_status.log.
set -x
cd "$(dirname "$0")/.."

stamp() { echo "$1 rc=$2 $(date -u +%FT%TZ)" >> /tmp/q5b_status.log; }

echo "queue5b start $(date -u +%FT%TZ)" >> /tmp/q5b_status.log

# 1. GAN train frontier retry (VERDICT r4 #6): the 00:17Z attempt hit a
# transient tunnel outage after bench_e2e.  B>=12 is a documented hard
# remote-compiler limit; B=10 tightens the bound.
timeout 4500 python scripts/gan_cost_tpu.py 4 4:0 8:0 8:1 10:0 \
    > /tmp/q5b_gancost.log 2>&1; stamp gancost $?

# 2. StableHLO artifact (VERDICT r4 #7): CPU-host export, TPU serve.
JAX_PLATFORMS=cpu timeout 2400 python scripts/export_serve_tpu.py \
    export /tmp/q5b_pipeline.rlx > /tmp/q5b_export.log 2>&1; stamp export $?
timeout 2400 python scripts/export_serve_tpu.py serve /tmp/q5b_pipeline.rlx \
    >> /tmp/q5b_export.log 2>&1; stamp serve $?

# 3. batched serving + planner under the pallas-parity-norm default
timeout 3600 python scripts/serving_e2e_tpu.py \
    > /tmp/q5b_serving.log 2>&1; stamp serving $?

# 4. GAN demo with the ssim term (VERDICT r4 #5): both oracle metrics.
timeout 10800 python scripts/train_eval_tpu_demo.py 3000 \
    > /tmp/q5b_gan_demo.log 2>&1; stamp gan_demo $?

echo "queue5b done $(date -u +%FT%TZ)" >> /tmp/q5b_status.log
