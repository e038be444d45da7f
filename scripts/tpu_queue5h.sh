#!/bin/sh
# Round-5 queue h (runs after queue5g): the gradient-matching GAN demo
# — 2000 steps from scratch, ssim_w=0, grad_w=30 (fg-masked
# forward-difference L1 vs GT).  Goal: OURS_SSIM > DAIN_SSIM while
# keeping the +3.6 dB PSNR win (VERDICT r4 #5); the direct SSIM term
# measured negative at w=8 and w=2.
set -x
cd "$(dirname "$0")/.."

stamp() { echo "$1 rc=$2 $(date -u +%FT%TZ)" >> /tmp/q5h_status.log; }

i=0
while ! grep -q "queue5g done" /tmp/q5g_status.log 2>/dev/null; do
    sleep 60
    i=$((i + 1))
    [ $i -gt 120 ] && { stamp wait_q5g timeout; break; }
done

echo "queue5h start $(date -u +%FT%TZ)" >> /tmp/q5h_status.log

rm -rf /tmp/demo_gan_ckpt   # fresh run: old step-1000/1500 ckpts are
                            # from the SSIM-term configs
timeout 7200 python scripts/train_eval_tpu_demo.py 2000 0.0 0 30.0 \
    > /tmp/q5h_gan_demo.log 2>&1; stamp gan_demo $?

echo "queue5h done $(date -u +%FT%TZ)" >> /tmp/q5h_status.log
