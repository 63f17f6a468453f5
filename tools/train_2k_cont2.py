"""Round-4 continuation of the seq-2048 flagship line (VERDICT r3 item 1).

Warm-starts checkpoints/byte16l-2k-pysrc.npz (the 700-step ctx2k snapshot,
eval 0.5045 nats at seq 2048) and keeps training at seq 2048. Round 2's
watcher killed the ctx2k run once eval went FLAT at ~500 steps — that was
the RoPE-interpolation convergence; this run buys the slow tail with a real
budget: deadline-sized steps (LAC_CONT2_HOURS) and a fresh cosine from a
moderate peak (the 8e-5 polish on the 1024 line plateaued WORSE, so the
peak here is higher, 1.5e-4, with a long decay to 1e-5).

Saves best-eval to checkpoints/byte16l-2k-v2.npz; promotion stays gated on
tools/ratio_probe_2k.py (slide, block 16384, exact bench slice) beating
bench.SHIPPED_FLAGSHIP_BPB.
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from lac_tpu.train import load_checkpoint, train_byte_lm

hours = float(os.environ.get("LAC_CONT2_HOURS", "3.0"))
sps = float(os.environ.get("LAC_CONT2_SPS", "1.50"))  # measured s/step budget
steps = max(500, int(hours * 3600 / sps) // 100 * 100)
lr = float(os.environ.get("LAC_CONT2_LR", "1.5e-4"))

icfg, init = load_checkpoint("checkpoints/byte16l-2k-pysrc.npz")
cfg = dataclasses.replace(icfg, max_seq=2176)  # seq+1 must fit in training
corpus = open("scratch/corpus_train.bin", "rb").read()
eval_corpus = open("scratch/corpus_eval.bin", "rb").read()

print(f"ctx2k continuation v2: {steps} steps (~{hours}h @ {sps}s/step), "
      f"lr {lr}, seq 2048, batch 32", flush=True)
t0 = time.time()
params, losses = train_byte_lm(
    cfg,
    corpus,
    steps=steps,
    batch=32,
    seq=2048,
    lr=lr,
    warmup=200,
    seed=4,  # fresh data order vs the 700-step run (seed=2)
    log_every=100,
    eval_corpus=eval_corpus,
    eval_every=250,
    eval_batches=4,
    save_best_path="checkpoints/byte16l-2k-v2.npz",
    save_max_seq=2048,
    init=init,
)
print(f"done in {time.time() - t0:.0f}s", flush=True)
