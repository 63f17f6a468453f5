"""Promotion gate for the ctx2k checkpoint (round-4 re-train; the round-3
gate ran BEFORE slide mode existed — it tested w2048 under reprime at block
4096, where re-prime cold-start punishes a wide window, and still nearly
matched shipped: 0.8794 vs 0.8769, r3_ratio_probe_2k.log).

This gate measures what the checkpoint was actually trained for: SLIDE mode
at the flagship block (bench.FLAGSHIP_BLOCK), window 2048 — ring cache +
global RoPE give every token the full 2048-token context with zero re-prime
work, and training at seq 2048 means no RoPE extrapolation (relative
distances stay <= 2047). Bpb is measured on the EXACT bench.py flagship
slice with the bit-exact round-trip enforced; an apples-to-apples w1024 run
says whether the 2k continuation also helps at the shipped window.

Promote iff min(bpb) < bench.SHIPPED_FLAGSHIP_BPB.
"""
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import bench
from lac_tpu.models.lm_registry import resolve_lm
from lac_tpu.runtime.lm_api import lm_compress_bytes, lm_decompress_bytes

CKPT = "checkpoints/byte16l-2k-pysrc.npz"
LANES = 16  # 16 x 16384-token blocks tile the 256 KiB slice exactly

hdata = bench.heldout_slice()


def probe(model, label: str) -> float:
    t0 = time.time()
    hc = lm_compress_bytes(
        hdata, model_ref=f"file:{CKPT}", block_tokens=bench.FLAGSHIP_BLOCK,
        lanes=LANES, overlap=bench.FLAGSHIP_OVERLAP, model=model,
        window_mode="slide", cache_grow=0,
    )
    te = time.time() - t0
    t0 = time.time()
    assert lm_decompress_bytes(hc, model=model) == hdata, "round-trip mismatch"
    td = time.time() - t0
    bpb = 8 * len(hc) / len(hdata)
    print(f"{label}: bpb = {bpb:.4f}  (shipped = {bench.SHIPPED_FLAGSHIP_BPB})"
          f"  enc {te:.0f}s dec {td:.0f}s", flush=True)
    return bpb


model = resolve_lm(f"file:{CKPT}", None)
print(f"ckpt max_seq = {model[0].max_seq}", flush=True)

# the 2k-window slide config this checkpoint was trained for
b2048 = probe(model, f"w2048 slide b{bench.FLAGSHIP_BLOCK} lanes{LANES}")

# same-window comparison (did the extra training help at the shipped w1024?)
m1024 = (dataclasses.replace(model[0], max_seq=1024), model[1])
b1024 = probe(m1024, f"w1024 slide b{bench.FLAGSHIP_BLOCK} lanes{LANES}")

best = min(b1024, b2048)
print("PROMOTE" if best < bench.SHIPPED_FLAGSHIP_BPB else "KEEP-SHIPPED")
