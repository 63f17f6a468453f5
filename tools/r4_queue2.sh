#!/bin/bash
# Round-4 queue 2 — big-model rows (VERDICT r3 items 2, 4, 5):
# 1. Llama-3-8B B=32 bisect: stages the [32,128256] prob_bits-18 coder
#    graph, one model step, then the fused encode separately so the log
#    names the wedging compile (r3_llama8b_b32.log died >26 min opaque).
# 2. Llama-2-7B at B=64: batch-amortization past the B=32 row (1765 tok/s
#    = ~45% of the 819 GB/s weight-stream bound); roofline math printed.
# 3. TinyLlama B=128 row warm-up: builds the persistent-cache entries so
#    bench.py's lm_tinyllama subprocess row is cheap for the driver.
cd /root/repo
set -x
timeout 5400 python tools/llama8b_b32_bisect.py \
  > measurements/r4_llama8b_b32_bisect.log 2>&1; echo "rc=$?" >> measurements/r4_llama8b_b32_bisect.log
LAC_7B_B=64 timeout 5400 python tools/llama7b_probe.py \
  > measurements/r4_llama7b_b64.log 2>&1; echo "rc=$?" >> measurements/r4_llama7b_b64.log
# kv8 halves the MHA cache read — the roofline's "other half" at B>=32
LAC_7B_B=64 LAC_7B_KV8=1 timeout 5400 python tools/llama7b_probe.py \
  > measurements/r4_llama7b_b64_kv8.log 2>&1; echo "rc=$?" >> measurements/r4_llama7b_b64_kv8.log
timeout 2400 python tools/bench_tinyllama_row.py \
  > measurements/r4_tinyllama_b128.log 2>&1; echo "rc=$?" >> measurements/r4_tinyllama_b128.log
echo QUEUE2-DONE
