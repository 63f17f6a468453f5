#!/bin/bash
# Round-3 follow-up queue: 7B at larger batch, TinyLlama retry, GPT-2 w8.
cd /root/repo
set -x
LAC_7B_B=32 python tools/llama7b_probe.py > measurements/r3_llama7b_b32.log 2>&1; echo "rc=$?" >> measurements/r3_llama7b_b32.log
timeout 2400 python tools/tinyllama_b256_probe.py > measurements/r3_tinyllama_b256.log 2>&1; echo "rc=$?" >> measurements/r3_tinyllama_b256.log
timeout 2400 python tools/gpt2_w8_probe.py > measurements/r3_gpt2_w8.log 2>&1; echo "rc=$?" >> measurements/r3_gpt2_w8.log
LAC_LM_BLOCK=512 python tools/lm_corpus_accept.py > measurements/r3_lm_corpus10_tput.log 2>&1; echo "rc=$?" >> measurements/r3_lm_corpus10_tput.log
echo QUEUE2-DONE
