#!/bin/bash
# Round-4 queue 5 — the serial chip chain for the rest of the round:
# 1. TinyLlama mismatch matrix re-run with the pinned w8 dequant (the fix's
#    on-chip proof; all 4 cells must be exact now).
# 2. TinyLlama B=128 bench row (the row bench.py will run).
# 3. 100 MB LM-path acceptance (VERDICT r3 item 6): slide+kv8 block 4096
#    lanes 256 — the measured 0.080/0.075 MB/s 10 MiB config.
# 4. Auditability re-measures (VERDICT r3 items 8+9).
# 5. byte-20l depth-upcycle training (deadline-sized) + its promotion gate.
cd /root/repo
set -x
timeout 3000 python tools/tinyllama_mismatch_probe.py \
  > measurements/r4_tinyllama_mismatch2.log 2>&1; echo "rc=$?" >> measurements/r4_tinyllama_mismatch2.log
timeout 2400 python tools/bench_tinyllama_row.py \
  > measurements/r4_tinyllama_b128_row.log 2>&1; echo "rc=$?" >> measurements/r4_tinyllama_b128_row.log
LAC_LM_MB=100 LAC_LM_WMODE=slide LAC_LM_KV8=1 timeout 7200 \
  python tools/lm_corpus_accept.py \
  > measurements/r4_lm_corpus100_slide_kv8.log 2>&1; echo "rc=$?" >> measurements/r4_lm_corpus100_slide_kv8.log
timeout 3600 python tools/remeasure_probe.py \
  > measurements/r4_remeasure.log 2>&1; echo "rc=$?" >> measurements/r4_remeasure.log
LAC_UP_HOURS=${LAC_UP_HOURS:-3.1} timeout 13000 python tools/train_byte20l_up.py \
  > measurements/r4_train20l.log 2>&1; echo "rc=$?" >> measurements/r4_train20l.log
timeout 3600 python tools/ratio_probe_20l.py \
  > measurements/r4_ratio_probe_20l.log 2>&1; echo "rc=$?" >> measurements/r4_ratio_probe_20l.log
echo QUEUE5-DONE
