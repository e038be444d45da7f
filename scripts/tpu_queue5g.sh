#!/bin/sh
# Round-5 queue g (runs after queue5f releases the chip): resolve the
# q5c export-serve anomalies — frozen_fps 32.2 vs q5b's 51.9, drift 2.0
# despite the input fix.  The upgraded do_serve times BOTH artifacts
# with the chained-carry methodology (per-rep blocking fetches through
# the tunnel were the old loop's dominant term) and prints the
# per-frame drift curve (chaotic amplification through the
# autoregressive rollout vs a real export bug).
set -x
cd "$(dirname "$0")/.."

stamp() { echo "$1 rc=$2 $(date -u +%FT%TZ)" >> /tmp/q5g_status.log; }

i=0
while ! grep -q "queue5f done" /tmp/q5f_status.log 2>/dev/null; do
    sleep 60
    i=$((i + 1))
    [ $i -gt 150 ] && { stamp wait_q5f timeout; break; }
done

echo "queue5g start $(date -u +%FT%TZ)" >> /tmp/q5g_status.log

timeout 2400 python scripts/export_serve_tpu.py serve /tmp/q5c_pipeline.rlx \
    > /tmp/q5g_export_c.log 2>&1; stamp serve_q5c $?
timeout 2400 python scripts/export_serve_tpu.py serve /tmp/q5b_pipeline.rlx \
    > /tmp/q5g_export_b.log 2>&1; stamp serve_q5b $?

echo "queue5g done $(date -u +%FT%TZ)" >> /tmp/q5g_status.log
