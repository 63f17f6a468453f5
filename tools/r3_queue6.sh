#!/bin/bash
# Round-3 queue 6: det8+slide TPU proof retry. The block-16384 attempt
# crashed the TPU WORKER during the det8 serial decode (r3_slide_det8.log:
# "TPU worker process crashed or restarted" — infra-or-runtime, not a
# Python error; encode had already succeeded). Retry at the known det8
# scale (block 4096) first to separate scale from transience, then the
# 16k config once.
cd /root/repo
set -x
LAC_SLIDE_BLOCK=4096 LAC_SLIDE_LANES=64 LAC_SLIDE_MODES=slide+det8 timeout 3600 \
  python tools/slide_probe.py > measurements/r3_slide_det8_b4k.log 2>&1; echo "rc=$?" >> measurements/r3_slide_det8_b4k.log
LAC_SLIDE_MODES=slide+det8 timeout 3600 python tools/slide_probe.py \
  > measurements/r3_slide_det8_b16k_retry.log 2>&1; echo "rc=$?" >> measurements/r3_slide_det8_b16k_retry.log
echo QUEUE6-DONE
