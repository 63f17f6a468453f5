#!/bin/bash
# Round-3 TPU measurement queue: one probe process at a time (each budgets
# its own first-compile stall), logs into measurements/.
cd /root/repo
set -x
python tools/kv8_ratio_probe.py   > measurements/r3_kv8_ratio.log 2>&1;    echo "rc=$?" >> measurements/r3_kv8_ratio.log
python tools/tinyllama_b256_probe.py > measurements/r3_tinyllama_b256.log 2>&1; echo "rc=$?" >> measurements/r3_tinyllama_b256.log
python tools/llama7b_probe.py     > measurements/r3_llama7b.log 2>&1;      echo "rc=$?" >> measurements/r3_llama7b.log
python tools/lm_corpus_accept.py  > measurements/r3_lm_corpus10.log 2>&1;  echo "rc=$?" >> measurements/r3_lm_corpus10.log
echo QUEUE-DONE
