#!/bin/bash
# Round-4 queue 3 — auditability re-measures (VERDICT r3 items 8, 9):
# every BASELINE.md row still citing an uncommitted scratch/*.log gets a
# committed measurements/ log (cache_grow, kv8 + enc/dec gap, train tok/s,
# forward ablation).
cd /root/repo
set -x
timeout 3600 python tools/remeasure_probe.py \
  > measurements/r4_remeasure.log 2>&1; echo "rc=$?" >> measurements/r4_remeasure.log
timeout 3600 python tools/fwd_ablation_probe.py \
  > measurements/r4_fwd_ablation.log 2>&1; echo "rc=$?" >> measurements/r4_fwd_ablation.log
echo QUEUE3-DONE
