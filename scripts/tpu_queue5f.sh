#!/bin/sh
# Round-5 queue f: decisions from the q5e XLA-norm serving A/B.
# (1) serving under the new batch-aware norm dispatch (Pallas for
#     single-clip programs B<=7, XLA past that) — expect best-of-both
#     of the q5c/q5e tables: clips=1 ~133 f/s AND clips=8 ~170.5 f/s;
# (2) the ssim_w=2 GAN demo control, resumed from the step-1000 orbax
#     checkpoint the q5d tunnel stall stranded.
# One TPU process at a time; logs /tmp/q5f_*.log.
set -x
cd "$(dirname "$0")/.."

stamp() { echo "$1 rc=$2 $(date -u +%FT%TZ)" >> /tmp/q5f_status.log; }

echo "queue5f start $(date -u +%FT%TZ)" >> /tmp/q5f_status.log

timeout 4500 python scripts/serving_e2e_tpu.py \
    > /tmp/q5f_serving.log 2>&1; stamp serving $?

timeout 7200 python scripts/train_eval_tpu_demo.py 2000 2.0 1000 \
    > /tmp/q5f_gan_demo.log 2>&1; stamp gan_demo $?

echo "queue5f done $(date -u +%FT%TZ)" >> /tmp/q5f_status.log
