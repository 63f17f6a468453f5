"""Train the byte-16l ratio flagship (67M params, d512/L16, seq 1024).

Schedule: 25k steps x batch 64 x seq 1024 = 1.64B tokens — the same token
budget as byte-12l's 50k x 64 x 512, spent on a 2.4x model and a doubled
window (the two measured ratio levers). Best-eval checkpoint saved to
checkpoints/byte16l-pysrc.npz (max_seq capped at the train length 1024).

Run tools/build_corpus.py first. One v5e chip; ~5h wall.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import dataclasses

from lac_tpu.models.lm_registry import PRESETS
from lac_tpu.train import train_byte_lm

# seq+1 training windows need one position beyond the coding context; the
# saved checkpoint is still capped at max_seq=1024 (the train length) by
# train_byte_lm's save_max_seq default.
cfg = dataclasses.replace(PRESETS["byte-16l"](), max_seq=2048)
corpus = open("scratch/corpus_train.bin", "rb").read()
eval_corpus = open("scratch/corpus_eval.bin", "rb").read()

t0 = time.time()
params, losses = train_byte_lm(
    cfg,
    corpus,
    steps=25000,
    batch=64,
    seq=1024,
    lr=3e-4,
    seed=0,
    log_every=100,
    eval_corpus=eval_corpus,
    eval_every=500,
    eval_batches=4,
    save_best_path="checkpoints/byte16l-pysrc.npz",
)
print(f"done in {time.time() - t0:.0f}s")
