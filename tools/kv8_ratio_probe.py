"""kv8 ratio probe (VERDICT round-2 item 6): measure the bpb cost of the
int8 KV cache on the exact bench.py flagship slice, byte-12l and byte-16l,
same config as the shipped flagship rows (block 4096, lanes 64, overlap 8).

kv8 perturbs the logits (quantized attention) identically on both sides, so
round-trips stay exact — the open question was only the ratio delta vs the
float cache, which this measures.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import bench
from lac_tpu.models.lm_registry import resolve_lm
from lac_tpu.runtime.lm_api import lm_compress_bytes, lm_decompress_bytes

hdata = bench.heldout_slice()

for ckpt in ("checkpoints/byte12l-pysrc.npz", "checkpoints/byte16l-pysrc.npz"):
    model = resolve_lm(f"file:{ckpt}", None)
    for kv8 in (False, True):
        t0 = time.time()
        hc = lm_compress_bytes(
            hdata, model_ref=f"file:{ckpt}", block_tokens=bench.FLAGSHIP_BLOCK,
            lanes=bench.FLAGSHIP_LANES, overlap=bench.FLAGSHIP_OVERLAP,
            model=model, kv8=kv8,
        )
        te = time.time() - t0
        assert lm_decompress_bytes(hc, model=model) == hdata, "round-trip"
        bpb = 8 * len(hc) / len(hdata)
        print(f"{ckpt.split('/')[-1]} kv8={kv8}: bpb = {bpb:.4f}  enc {te:.0f}s",
              flush=True)
