#!/bin/bash
# Round-4 queue 4 — the 100 MB LM-path acceptance (VERDICT r3 item 6;
# BASELINE.md:34's mandated corpus size). Config: slide + kv8 at block 4096
# lanes 256 (the measured 0.080/0.075 MB/s 10 MiB point → ~21 min per
# direction at 100 MB; kv8's ratio cost is +0.0009 bpb there).
cd /root/repo
set -x
LAC_LM_MB=100 LAC_LM_WMODE=slide LAC_LM_KV8=1 timeout 7200 \
  python tools/lm_corpus_accept.py \
  > measurements/r4_lm_corpus100_slide_kv8.log 2>&1; echo "rc=$?" >> measurements/r4_lm_corpus100_slide_kv8.log
echo QUEUE4-DONE
