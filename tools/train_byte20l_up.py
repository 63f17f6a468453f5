"""Round-4 flagship training attempt: depth-upcycled byte-20l (VERDICT r3
item 1, redirected by measurement).

The round-4 slide-mode gate killed the long-window line for good: the ctx2k
checkpoint scores 0.8312 bpb at window 2048 vs 0.8303 at window 1024 on the
exact bench slice (measurements/r4_ratio_probe_2k_slide.log) — at this
param scale, context past 1024 contributes ~nothing, and the seq-2048
finetune damaged in-distribution quality (byte-16l at the same w1024 config
codes 0.8188). The remaining ratio lever is model CAPACITY at seq 1024.

This run warm-starts a 20-layer model from the shipped byte-16l by
APPENDING a copy of the last four layers (tail-repeat [0..15, 12..15] —
the measured-best of three duplication layouts; the stacked [L, ...] param
layout makes the upcycle one np.take along axis 0) and continues training
at the byte-16l recipe shapes. Deadline-sized steps,
best-eval checkpointing; promotion stays gated on the exact bench slice vs
bench.SHIPPED_FLAGSHIP_BPB (tools/ratio_probe_20l.py).
"""
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from lac_tpu.train import load_checkpoint, train_byte_lm

hours = float(os.environ.get("LAC_UP_HOURS", "3.5"))
sps = float(os.environ.get("LAC_UP_SPS", "1.20"))  # est s/step (16l was 0.92)
steps = max(500, int(hours * 3600 / sps) // 100 * 100)
lr = float(os.environ.get("LAC_UP_LR", "1.5e-4"))

icfg, init = load_checkpoint("checkpoints/byte16l-pysrc.npz")
assert icfg.n_layers == 16, icfg
# tail-repeat upcycle [0..15, 12..15]: measured the closest start of three
# duplication layouts on held-out bytes (0.8940 nats vs 0.9105 adjacent-
# last-8, 0.9732 interleaved-every-4th; base 16l = 0.8301 on the same
# slice) — appending a copy of the last 4 layers perturbs the residual
# stream least
idx = np.asarray(list(range(16)) + [12, 13, 14, 15])
init = dict(init)
init["layers"] = {
    k: (np.take(np.asarray(v), idx, axis=0) if not isinstance(v, dict) else
        {kk: np.take(np.asarray(vv), idx, axis=0) for kk, vv in v.items()})
    for k, v in init["layers"].items()
}
cfg = dataclasses.replace(icfg, n_layers=20, max_seq=1088)  # seq+1 fits

print(f"byte-20l upcycle: {steps} steps (~{hours}h @ {sps}s/step), lr {lr}, "
      f"seq 1024, batch 64, dup idx {idx.tolist()}", flush=True)
corpus = open("scratch/corpus_train.bin", "rb").read()
eval_corpus = open("scratch/corpus_eval.bin", "rb").read()

t0 = time.time()
params, losses = train_byte_lm(
    cfg,
    corpus,
    steps=steps,
    batch=64,
    seq=1024,
    lr=lr,
    warmup=300,
    seed=5,  # fresh data order vs every prior run
    log_every=100,
    eval_corpus=eval_corpus,
    eval_every=250,
    eval_batches=4,
    save_best_path="checkpoints/byte20l-pysrc.npz",
    save_max_seq=1024,
    init=init,
)
print(f"done in {time.time() - t0:.0f}s", flush=True)
