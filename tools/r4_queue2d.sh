#!/bin/bash
# Round-4 queue 2d:
# 1. TinyLlama B=128 rerun (blocked cumsum default): the original mismatch
#    (r4_tinyllama_b128.log) ran on a worker that gave the NEXT process
#    FailedPrecondition at init — suspected sick-worker artifact, and the
#    8B bisect2 round-trip proves the blocked cumsum exact on chip at the
#    vocab it exists for.
# 2. Llama-3-8B at B=64 (post-fix batch scaling; ~10.7 GB resident).
cd /root/repo
set -x
timeout 2400 python tools/bench_tinyllama_row.py \
  > measurements/r4_tinyllama_b128_try2.log 2>&1; echo "rc=$?" >> measurements/r4_tinyllama_b128_try2.log
LAC_8B_B=64 timeout 5400 python tools/llama8b_b32_bisect.py \
  > measurements/r4_llama8b_b64.log 2>&1; echo "rc=$?" >> measurements/r4_llama8b_b64.log
echo QUEUE2D-DONE
