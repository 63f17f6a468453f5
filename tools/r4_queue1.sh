#!/bin/bash
# Round-4 queue 1 — the flagship-ratio + slide_seg measurements
# (VERDICT r3 items 1(gate), 3, 7; ADVICE r3 medium):
# 1. ctx2k checkpoint gate under SLIDE at w2048/block 16384 — the round-3
#    gate ran under reprime where a wide window is punished by re-prime
#    cold-start (0.8794 vs 0.8769 shipped); slide gives the full 2048-token
#    context with zero re-prime work, which is what the checkpoint was
#    trained for. PROMOTE iff < 0.8188.
# 2. flagship warm-rep probe: separates compile from steady-state wall
#    (VERDICT weak-4: enc 221s vs dec 42s at b16k was conflated), and
#    exercises the new slide_seg segmented float schedule at flagship scale.
# 3. det8+slide at block 16384 through the segmented decode (ADVICE r3
#    medium: auto routing is gated on blocks <=4096 until this run lands).
# 4. 10 MiB corpus at the flagship block at lanes 256 — the round-3 crash
#    config; the slide_seg bounded-scan schedule is the hypothesized fix
#    (same fault class as det8's long-scan crash).
cd /root/repo
set -x
timeout 5400 python tools/ratio_probe_2k.py \
  > measurements/r4_ratio_probe_2k_slide.log 2>&1; echo "rc=$?" >> measurements/r4_ratio_probe_2k_slide.log
LAC_SLIDE_WARM=1 LAC_SLIDE_MODES=slide timeout 5400 python tools/slide_probe.py \
  > measurements/r4_slide_b16k_warm.log 2>&1; echo "rc=$?" >> measurements/r4_slide_b16k_warm.log
LAC_SLIDE_MODES=slide+det8 timeout 4800 python tools/slide_probe.py \
  > measurements/r4_slide_det8_b16k.log 2>&1; echo "rc=$?" >> measurements/r4_slide_det8_b16k.log
LAC_LM_WMODE=slide LAC_LM_BLOCK=16384 LAC_LM_LANES=256 timeout 7200 \
  python tools/lm_corpus_accept.py \
  > measurements/r4_lm_corpus10_slide_b16k_l256.log 2>&1; echo "rc=$?" >> measurements/r4_lm_corpus10_slide_b16k_l256.log
echo QUEUE1-DONE
