"""Continuation run for byte-16l: warm-start from the finished 25k-step
checkpoint and keep training at a lower peak LR. Saves best-eval to a
SEPARATE file (byte16l-cont-pysrc.npz) because best-eval tracking restarts
at +inf in a new run — the main checkpoint must not be overwritten by a
worse early eval. Promote manually after comparing held-out bpb.

Steps are sized by a deadline (LAC_CONT_HOURS, default 3.5h at the measured
~0.92 s/step) so the run always finishes and saves before the round ends.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import dataclasses

from lac_tpu.models.lm_registry import PRESETS
from lac_tpu.train import load_checkpoint, train_byte_lm

hours = float(os.environ.get("LAC_CONT_HOURS", "3.5"))
steps = int(hours * 3600 / 0.92 // 500 * 500)
print(f"continuation: {steps} steps (~{hours}h)", flush=True)

icfg, init = load_checkpoint("checkpoints/byte16l-pysrc.npz")
cfg = dataclasses.replace(PRESETS["byte-16l"](), max_seq=2048)
corpus = open("scratch/corpus_train.bin", "rb").read()
eval_corpus = open("scratch/corpus_eval.bin", "rb").read()

t0 = time.time()
params, losses = train_byte_lm(
    cfg,
    corpus,
    steps=steps,
    batch=64,
    seq=1024,
    lr=1e-4,
    seed=1,  # fresh data order vs the base run
    log_every=100,
    eval_corpus=eval_corpus,
    eval_every=500,
    eval_batches=4,
    save_best_path="checkpoints/byte16l-cont-pysrc.npz",
    init=init,
)
print(f"done in {time.time() - t0:.0f}s", flush=True)
