#!/bin/bash
# Round-3 queue 4: slide at big blocks (cold-start fraction cut) and the
# slide+kv8 corpus throughput config.
cd /root/repo
set -x
LAC_SLIDE_BLOCK=16384 LAC_SLIDE_LANES=16 LAC_SLIDE_MODES=slide \
  timeout 3600 python tools/slide_probe.py > measurements/r3_slide_b16k.log 2>&1; echo "rc=$?" >> measurements/r3_slide_b16k.log
LAC_LM_WMODE=slide LAC_LM_KV8=1 timeout 3600 python tools/lm_corpus_accept.py \
  > measurements/r3_lm_corpus10_slide_kv8.log 2>&1; echo "rc=$?" >> measurements/r3_lm_corpus10_slide_kv8.log
echo QUEUE4-DONE
