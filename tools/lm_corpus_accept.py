"""LM-path large-corpus acceptance (VERDICT round-2 item 7): run N MB
end-to-end through lm_compress_bytes/lm_decompress_bytes with the wave
pipeline and the shipped byte-12l checkpoint; report MB/s, bpb, and
bit-exactness. (The 100 MB acceptance run exists for order0n only —
BASELINE.md; this is the LM-path counterpart at its own scale.)
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import bench
from lac_tpu.models.lm_registry import resolve_lm
from lac_tpu.runtime.lm_api import lm_compress_bytes, lm_decompress_bytes

MB = int(os.environ.get("LAC_LM_MB", "10"))
# block_tokens > the model window = the RATIO config (re-prime prefills
# dominate: 448 prefill tokens per 64 coded at ov8). block_tokens = window
# = the THROUGHPUT config (no re-priming). Probe both via env.
BLOCK = int(os.environ.get("LAC_LM_BLOCK", "4096"))
OVERLAP = int(os.environ.get("LAC_LM_OVERLAP", "8"))
WMODE = os.environ.get("LAC_LM_WMODE", "reprime")  # reprime | slide
KV8 = bool(int(os.environ.get("LAC_LM_KV8", "0")))
# wave width: block 16384 x lanes 256 crashed the TPU worker (queue5);
# block 16384 x lanes 16 works (r3_slide_b16k.log) — probe the middle
LANES = int(os.environ.get("LAC_LM_LANES", "256"))
CKPT = "checkpoints/byte12l-pysrc.npz"

data = bench.build_corpus(MB << 20)
model = resolve_lm(f"file:{CKPT}", None)

# warm the executables on a tiny slice so the timed run measures the
# pipeline, not the one-time compile — exactly ONE wave (BLOCK*LANES bytes)
lm_compress_bytes(data[: BLOCK * LANES], model_ref=f"file:{CKPT}",
                  block_tokens=BLOCK, lanes=LANES, overlap=OVERLAP, model=model,
                  window_mode=WMODE, kv8=KV8)

t0 = time.time()
c = lm_compress_bytes(data, model_ref=f"file:{CKPT}", block_tokens=BLOCK,
                      lanes=LANES, overlap=OVERLAP, model=model,
                      window_mode=WMODE, kv8=KV8)
te = time.time() - t0
print(f"compress {MB} MiB (block {BLOCK} ov {OVERLAP} {WMODE}"
      f"{' kv8' if KV8 else ''}): {len(data)/te/1e6:.3f} MB/s, "
      f"{8*len(c)/len(data):.4f} bpb ({te:.0f}s)", flush=True)
t0 = time.time()
back = lm_decompress_bytes(c, model=model)
td = time.time() - t0
assert back == data, "round-trip mismatch"
print(f"decompress: {len(data)/td/1e6:.3f} MB/s ({td:.0f}s); bit-exact",
      flush=True)
