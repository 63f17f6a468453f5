#!/bin/bash
# Round-4 queue 2c — bisect the TinyLlama B=128 w8 round-trip MISMATCH
# (r4_tinyllama_b128.log, the tool's first-ever chip run, which also ran
# with the new blocked CDF cumsum live at V=32000):
# A. flat scan (LAC_CDF_CHUNK=1000000): if this passes, the blocked cumsum
#    perturbs XLA fusion DIFFERENTLY in the encode vs decode graphs at
#    TinyLlama shapes -> float logits drift between the two programs (the
#    engine's same-schedule contract); restrict blocking to V > 65536.
# B. the 8B bisect rerun (blocked cumsum at [32,128256]): stage-1 compile
#    should fall from 1114s to seconds; stage 3 is the fused B=32 row with
#    its own round-trip assert, which also validates blocked-cumsum
#    correctness at the vocab it exists for.
cd /root/repo
set -x
LAC_CDF_CHUNK=1000000 timeout 2400 python tools/bench_tinyllama_row.py \
  > measurements/r4_tinyllama_b128_flat.log 2>&1; echo "rc=$?" >> measurements/r4_tinyllama_b128_flat.log
timeout 5400 python tools/llama8b_b32_bisect.py \
  > measurements/r4_llama8b_b32_bisect2.log 2>&1; echo "rc=$?" >> measurements/r4_llama8b_b32_bisect2.log
echo QUEUE2C-DONE
