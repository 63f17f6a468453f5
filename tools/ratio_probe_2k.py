"""Promotion gate for the ctx2k checkpoint (round-3 honest re-run).

Measures windowed-coding bpb of byte16l-2k-pysrc.npz on the EXACT bench.py
flagship slice (bench.heldout_slice(); the slice construction and the
shipped figure are imported from bench.py so this gate cannot silently
drift from what the driver measures), with the bit-exact round-trip
enforced. Promote iff bpb < bench.SHIPPED_FLAGSHIP_BPB.

Round-2 postmortem: at the shipped wave width (lanes=64) the window-2048
path OOMs the v5e (16-layer cache at width 2048 is ~4.3 GB and the re-prime
prefill materializes [B,H,1792,W] scores), so this probe runs the 2k window
at LANES_2K lanes — a config that actually fits; if promoted, bench.py must
advertise that same config for this checkpoint (wave shape is part of the
bitstream contract). Also probes the checkpoint at the shipped w1024
config for an apples-to-apples "did the extra training help at the same
window" read.
"""
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import bench
from lac_tpu.models.lm_registry import resolve_lm
from lac_tpu.runtime.lm_api import lm_compress_bytes, lm_decompress_bytes

CKPT = "checkpoints/byte16l-2k-pysrc.npz"
LANES_2K = 16

hdata = bench.heldout_slice()


def probe(model, lanes: int, label: str) -> float:
    t0 = time.time()
    hc = lm_compress_bytes(
        hdata, model_ref=f"file:{CKPT}", block_tokens=bench.FLAGSHIP_BLOCK,
        lanes=lanes, overlap=bench.FLAGSHIP_OVERLAP, model=model,
    )
    te = time.time() - t0
    assert lm_decompress_bytes(hc, model=model) == hdata, "round-trip mismatch"
    bpb = 8 * len(hc) / len(hdata)
    print(f"{label}: bpb = {bpb:.4f}  (shipped = {bench.SHIPPED_FLAGSHIP_BPB})"
          f"  enc {te:.0f}s", flush=True)
    return bpb


model = resolve_lm(f"file:{CKPT}", None)
print(f"ckpt max_seq = {model[0].max_seq}", flush=True)

# same-window comparison first (cheap; shipped shapes)
m1024 = (dataclasses.replace(model[0], max_seq=1024), model[1])
b1024 = probe(m1024, bench.FLAGSHIP_LANES, "w1024 ov8 lanes64")

# the 2k-window config this checkpoint was trained for
b2048 = probe(model, LANES_2K, f"w2048 ov8 lanes{LANES_2K}")

best = min(b1024, b2048)
print("PROMOTE" if best < bench.SHIPPED_FLAGSHIP_BPB else "KEEP-SHIPPED")
