"""Promotion gate for the round-4 byte-20l depth-upcycle checkpoint.

Measures slide-mode bpb of checkpoints/byte20l-pysrc.npz on the EXACT
bench.py flagship slice at whatever bench.FLAGSHIP_BLOCK/FLAGSHIP_LANES
currently ship (the gate TRACKS the live flagship config — round 5:
block 65536, lanes 4, segmented slide), bit-exact round-trip enforced.
The r4 gate log (measurements/r4_ratio_probe_20l.log) ran at the then-
flagship block 16384/lanes 16. Promote iff bpb < bench.SHIPPED_FLAGSHIP_BPB
(then: bench.FLAGSHIP_CKPTS gains the 20l first, SHIPPED_FLAGSHIP_BPB
moves, BASELINE.md gets the row).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import bench
from lac_tpu.models.lm_registry import resolve_lm
from lac_tpu.runtime.lm_api import lm_compress_bytes, lm_decompress_bytes

CKPT = "checkpoints/byte20l-pysrc.npz"
hdata = bench.heldout_slice()

model = resolve_lm(f"file:{CKPT}", None)
print(f"ckpt: n_layers={model[0].n_layers} max_seq={model[0].max_seq}",
      flush=True)
t0 = time.time()
c = lm_compress_bytes(
    hdata, model_ref=f"file:{CKPT}", block_tokens=bench.FLAGSHIP_BLOCK,
    lanes=bench.FLAGSHIP_LANES, overlap=bench.FLAGSHIP_OVERLAP, model=model,
    window_mode="slide", cache_grow=0,
)
te = time.time() - t0
t0 = time.time()
assert lm_decompress_bytes(c, model=model) == hdata, "round-trip mismatch"
td = time.time() - t0
bpb = 8 * len(c) / len(hdata)
print(f"byte20l w1024 slide b{bench.FLAGSHIP_BLOCK} lanes"
      f"{bench.FLAGSHIP_LANES}: bpb = {bpb:.4f} "
      f"(shipped = {bench.SHIPPED_FLAGSHIP_BPB})  enc {te:.0f}s dec {td:.0f}s",
      flush=True)
print("PROMOTE" if bpb < bench.SHIPPED_FLAGSHIP_BPB else "KEEP-SHIPPED")
