#!/bin/bash
# Round-5 post-training TPU queue (fire after the byte-20l run exits; the
# ratio gate runs separately once the final best checkpoint is on disk).
# Stages are subprocess-isolated only where crash risk exists (det8 long
# decode class); the rest share processes to amortize the device connect.
cd /root/repo

# A: clean 8B rows — B=96 re-run (contended row: 2856/2861) and the first
# B=128 attempt with the staged init (r4 B=128 OOMed in coder+init)
LAC_8B_B=96 timeout 2400 python tools/llama8b_probe.py \
  > measurements/r5_llama8b_b96_clean.log 2>&1
echo "rc=$?" >> measurements/r5_llama8b_b96_clean.log

LAC_8B_B=128 timeout 2400 python tools/llama8b_probe.py \
  > measurements/r5_llama8b_b128.log 2>&1
echo "rc=$?" >> measurements/r5_llama8b_b128.log

# B: det8+slide at the flagship block 65536 (ADVICE r4 item: auto routes
# det8->slide at every block but the on-chip proof stops at 16384).
# Isolated: the det8 long-decode class has faulted workers before.
LAC_SLIDE_MODES=slide+det8 LAC_SLIDE_BLOCK=65536 LAC_SLIDE_LANES=4 \
  LAC_SLIDE_ONLY=byte16l timeout 3600 python tools/slide_probe.py \
  > measurements/r5_slide_det8_b64k.log 2>&1
echo "rc=$?" >> measurements/r5_slide_det8_b64k.log

# C: re-bank the 10 MiB corpus acceptance on a quiet chip (r4: 0.080/0.073)
LAC_LM_MB=10 LAC_LM_WMODE=slide LAC_LM_KV8=1 timeout 3600 \
  python tools/lm_corpus_accept.py \
  > measurements/r5_lm_corpus10_slide_kv8.log 2>&1
echo "rc=$?" >> measurements/r5_lm_corpus10_slide_kv8.log

echo "post-queue done"
