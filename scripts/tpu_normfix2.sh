#!/bin/sh
# Round 2 of the regression A/B: the first block proved r3bench
# (mid-r3 89d3c7c, CENTERED apply) reads 7.053 tonight while
# HEAD+onepass (FOLDED apply, 05ca0b3) reads 6.398 — the fold itself
# is the second regression component.  Measure both centered forms
# under HEAD.
set -x
cd "$(dirname "$0")/.."
stamp() { echo "$1 rc=$2 $(date -u +%FT%TZ)" >> /tmp/q5_status.log; }
for impl in centered r3centered; do
  RENDERLOOM_NORM_IMPL=$impl BENCH_METRIC=gan_train timeout 2400 \
    python bench.py > /tmp/q5_nb_$impl.log 2>&1; stamp nb_$impl $?
done
echo "normfix2 done $(date -u +%FT%TZ)" >> /tmp/q5_status.log
