"""Promotion gate for the ctx2k checkpoint (queue6 of the round-2 plan).

Measures windowed-coding bpb of byte16l-2k-pysrc.npz on the EXACT bench.py
flagship slice (first 256 KiB of the held-out stdlib split) at the shipped
config (block 4096, lanes 64, overlap 8; window = ckpt max_seq = 2048), with
the bit-exact round-trip enforced. Promote iff bpb < 0.8769 (the shipped
byte-16l window-1024 figure, BASELINE.md).
"""
import glob
import sys
import time

sys.path.insert(0, "/root/repo")

from lac_tpu.models.lm_registry import resolve_lm
from lac_tpu.runtime.lm_api import lm_compress_bytes, lm_decompress_bytes

CKPT = "checkpoints/byte16l-2k-pysrc.npz"

files = sorted(glob.glob("/usr/lib/python3.11/**/*.py", recursive=True))
held = [f for i, f in enumerate(files) if i % 13 == 0]
hdata = b"".join(open(f, "rb").read() for f in held)[:262144]

model = resolve_lm(f"file:{CKPT}", None)
print(f"ckpt max_seq = {model[0].max_seq}", flush=True)
t0 = time.time()
hc = lm_compress_bytes(
    hdata, model_ref=f"file:{CKPT}", block_tokens=4096, lanes=64, overlap=8,
    model=model,
)
te = time.time() - t0
assert lm_decompress_bytes(hc, model=model) == hdata, "round-trip mismatch"
bpb = 8 * len(hc) / len(hdata)
print(f"w2048 ov8 bpb = {bpb:.4f}  (shipped w1024 = 0.8769)  enc {te:.0f}s")
print("PROMOTE" if bpb < 0.8769 else "KEEP-SHIPPED")
