#!/bin/bash
# Round-3 queue 7 (after queue6's det8+slide retry):
# 1. Llama-3-8B single-chip capability row (BASELINE config #5's model,
#    w8 int8 = ~8 GiB resident; GQA + 128k vocab).
# 2. 10 MiB corpus at the flagship block (16384) in slide mode at lanes 64
#    — lanes 256 crashed the TPU worker (queue5), lanes 16 works at this
#    block (r3_slide_b16k.log); this bisects the wave width.
# 3. TinyLlama B=256 fourth attempt (three prior wedges were the
#    service-side first-compile stall class; budget one stall).
# 0. det8+slide with the SEGMENTED serial decode (lm_engine
#    _decode_scan_slide_seg): the single long-scan decode program crashes
#    the worker at every tried size; bounded segments (the reprime det8
#    path's shape class) decode 4096 tokens fine (r3_det8_bisect.log).
cd /root/repo
set -x
LAC_SLIDE_BLOCK=4096 LAC_SLIDE_LANES=64 LAC_SLIDE_MODES=slide+det8 timeout 3600 \
  python tools/slide_probe.py \
  > measurements/r3_slide_det8_seg.log 2>&1; echo "rc=$?" >> measurements/r3_slide_det8_seg.log
LAC_8B_B=4 timeout 3600 python tools/llama8b_probe.py \
  > measurements/r3_llama8b.log 2>&1; echo "rc=$?" >> measurements/r3_llama8b.log
LAC_LM_WMODE=slide LAC_LM_BLOCK=16384 LAC_LM_LANES=64 timeout 5400 \
  python tools/lm_corpus_accept.py \
  > measurements/r3_lm_corpus10_slide_b16k_l64.log 2>&1; echo "rc=$?" >> measurements/r3_lm_corpus10_slide_b16k_l64.log
timeout 2700 python tools/tinyllama_b256_probe.py \
  > measurements/r3_tinyllama_b256_try4.log 2>&1; echo "rc=$?" >> measurements/r3_tinyllama_b256_try4.log
echo QUEUE7-DONE
