#!/bin/bash
# Round-3 queue 5: det8+slide proven ON TPU (CPU tests can't certify TPU
# numerics for float paths; det8 is int-invariant BY DESIGN — this is the
# hardware proof), flagship-config corpus run, block-size asymptote.
cd /root/repo
set -x
LAC_SLIDE_MODES=slide+det8 timeout 3600 python tools/slide_probe.py \
  > measurements/r3_slide_det8.log 2>&1; echo "rc=$?" >> measurements/r3_slide_det8.log
LAC_LM_WMODE=slide LAC_LM_BLOCK=16384 timeout 5400 python tools/lm_corpus_accept.py \
  > measurements/r3_lm_corpus10_slide_b16k.log 2>&1; echo "rc=$?" >> measurements/r3_lm_corpus10_slide_b16k.log
LAC_SLIDE_BLOCK=65536 LAC_SLIDE_LANES=4 LAC_SLIDE_MODES=slide timeout 5400 \
  python tools/slide_probe.py > measurements/r3_slide_b64k.log 2>&1; echo "rc=$?" >> measurements/r3_slide_b64k.log
echo QUEUE5-DONE
