#!/bin/bash
# Round-4 queue 2b — Llama-3-8B B=32 retry with the blocked-cumsum fix
# (ops/quantize._cumsum_blocked): the bisect named the wedge — the
# STANDALONE [32,128256] prob_bits-18 coder stage compiled for 1114s
# (r4_llama8b_b32_bisect.log), dominated by the flat depth-17
# associative_scan over the non-pow2 128257-wide vocab. The blocked form is
# bit-identical (integer adds) and should compile in seconds; stages 2/3
# then give the full fused encode/decode row + roofline.
cd /root/repo
set -x
timeout 5400 python tools/llama8b_b32_bisect.py \
  > measurements/r4_llama8b_b32_bisect2.log 2>&1; echo "rc=$?" >> measurements/r4_llama8b_b32_bisect2.log
echo QUEUE2B-DONE
