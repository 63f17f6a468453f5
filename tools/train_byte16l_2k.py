"""Context-doubling continuation for byte-16l: warm-start the shipped
1024-context checkpoint and train at seq 2048 so the coding window doubles.

Measured finding (round-2 session 5, re-run here after a workspace reset ate
the checkpoint): the RoPE interpolation converges almost immediately — held-out
eval reached its plateau within ~500 steps and stayed flat — so this is a
short, deadline-bounded run, not a full schedule. Saves best-eval to a
SEPARATE file; promotion is gated on a windowed-coding bpb probe at window
2048 beating the shipped 0.8769 (block 4096, overlap 8).

cfg.max_seq is raised to 2176 only so that seq+1 fits during training; the
saved checkpoint caps max_seq at 2048 (= the trained window).
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from lac_tpu.train import load_checkpoint, train_byte_lm

steps = int(os.environ.get("LAC_2K_STEPS", "700"))
icfg, init = load_checkpoint("checkpoints/byte16l-pysrc.npz")
# derive the continuation config from the CHECKPOINT's own config (not the
# preset, which could drift from the shipped weights' architecture)
cfg = dataclasses.replace(icfg, max_seq=2176)
corpus = open("scratch/corpus_train.bin", "rb").read()
eval_corpus = open("scratch/corpus_eval.bin", "rb").read()

print(f"ctx2k continuation: {steps} steps, seq 2048, batch 32", flush=True)
t0 = time.time()
params, losses = train_byte_lm(
    cfg,
    corpus,
    steps=steps,
    batch=32,
    seq=2048,
    lr=1e-4,
    warmup=50,
    seed=2,  # fresh data order vs the base run and the 1024-cont run
    log_every=50,
    eval_corpus=eval_corpus,
    eval_every=100,
    eval_batches=4,
    save_best_path="checkpoints/byte16l-2k-pysrc.npz",
    save_max_seq=2048,
    init=init,
)
print(f"done in {time.time() - t0:.0f}s", flush=True)
