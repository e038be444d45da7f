#!/bin/sh
# Decisive GAN-regression A/B (VERDICT r4 #1), driver protocol
# (BENCH_METRIC=gan_train bench.py — the harness behind both the 7.104
# round-3 control and the 5.62 round-4 capture), all in ONE serialized
# TPU block so environment drift can't confound it:
#   vjp      — HEAD default (round-5 custom-VJP instance norm)
#   onepass  — r3 norm body under HEAD everything-else
#   shifted  — r4 norm body (the regression capture)
#   r3       — the exact round-3 checkout (/tmp/r3bench, 7.104 on
#              2026-08-19 10:46Z)
set -x
cd "$(dirname "$0")/.."

stamp() { echo "$1 rc=$2 $(date -u +%FT%TZ)" >> /tmp/q5_status.log; }

echo "normfix start $(date -u +%FT%TZ)" >> /tmp/q5_status.log

for impl in vjp onepass shifted; do
  RENDERLOOM_NORM_IMPL=$impl BENCH_METRIC=gan_train timeout 2400 \
    python bench.py > /tmp/q5_nb_$impl.log 2>&1; stamp nb_$impl $?
done

cd /tmp/r3bench && BENCH_METRIC=gan_train timeout 2400 python bench.py \
  > /tmp/q5_nb_r3.log 2>&1; stamp nb_r3 $?

echo "normfix done $(date -u +%FT%TZ)" >> /tmp/q5_status.log
