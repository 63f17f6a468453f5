"""Round-5 VERDICT item 1: the byte-20l depth-upcycle at a FULL-round
budget, warm-started from the round-4 ~400-step upcycle snapshot that
commit fa87623 captured (eval 0.5405 — saves the first ~0.5 h of healing).

Recipe per the r4 findings: lr 1.2e-4 cosine (the r4 run used 1.5e-4 and
was still improving −0.001 eval/1000 steps at its 2.9 h cut), B=64 x seq
1024, fresh data order. Promotion stays gated on the exact bench slice at
the live flagship config vs bench.SHIPPED_FLAGSHIP_BPB = 0.8032
(tools/ratio_probe_20l.py) — the honest-gate discipline.

Env knobs: LAC_UP_HOURS (default 6.5), LAC_UP_SPS (est s/step for step
sizing), LAC_UP_LR, LAC_FUSED ("bf16s"/"flash"/"splash"/"" = exact).
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from lac_tpu.models import transformer as T
from lac_tpu.train import load_checkpoint, train_byte_lm

hours = float(os.environ.get("LAC_UP_HOURS", "6.5"))
sps = float(os.environ.get("LAC_UP_SPS", "1.15"))
steps = max(500, int(hours * 3600 / sps) // 100 * 100)
lr = float(os.environ.get("LAC_UP_LR", "1.2e-4"))
fused = os.environ.get("LAC_FUSED", "")
if fused:
    T._FUSED["impl"] = fused

icfg, init = load_checkpoint("scratch/byte20l_warm.npz")
assert icfg.n_layers == 20, icfg
cfg = dataclasses.replace(icfg, max_seq=1088)  # seq+1 fits

print(f"byte-20l r5 continuation: {steps} steps (~{hours}h @ {sps}s/step), "
      f"lr {lr}, seq 1024, batch 64, fused={fused or 'exact'}", flush=True)
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
    seed=6,  # fresh data order vs every prior run
    log_every=100,
    eval_corpus=eval_corpus,
    eval_every=250,
    eval_batches=4,
    save_best_path="checkpoints/byte20l-pysrc.npz",
    save_max_seq=1024,
    init=init,
    fused_attn=bool(fused),
)
print(f"done in {time.time() - t0:.0f}s", flush=True)
