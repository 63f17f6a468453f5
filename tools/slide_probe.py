"""Slide-mode promotion gate (TPU): ratio + wall time vs reprime on the
EXACT bench.py flagship slice, both flagship checkpoints.

Slide mode (lm_engine window_mode="slide") rings a fixed cfg.max_seq cache
with global RoPE positions: no re-prime prefills (reprime at ov8 re-encodes
7 context tokens per coded token) and every token sees the full W-token
context instead of reprime's keep..W range. Expected: bpb <= the shipped
reprime figures (byte-16l 0.8769 ov8, byte-12l 0.9339 ov8 float — both
measured in measurements/r3_kv8_ratio.log) and several-fold faster wall.

Promotion rule: flip bench.py FLAGSHIP_MODE to "slide" iff bpb < shipped
reprime bpb on this slice. kv8 composes — probe it too (its reprime delta
was +0.0014-0.0019 bpb).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import bench
from lac_tpu.models.lm_registry import resolve_lm
from lac_tpu.runtime.lm_api import lm_compress_bytes, lm_decompress_bytes

# block/lanes overridable: bigger slide blocks cut the per-block cold-start
# fraction (the first W tokens of every block see < W context)
BLOCK = int(os.environ.get("LAC_SLIDE_BLOCK", str(bench.FLAGSHIP_BLOCK)))
LANES = int(os.environ.get("LAC_SLIDE_LANES", str(bench.FLAGSHIP_LANES)))
MODES = os.environ.get("LAC_SLIDE_MODES", "reprime,slide,slide+kv8").split(",")

hdata = bench.heldout_slice()
print(f"held-out slice: {len(hdata)} bytes, block {BLOCK} lanes {LANES}",
      flush=True)

CASES = [
    ("byte16l", "checkpoints/byte16l-pysrc.npz", 0.8769),
    ("byte12l", "checkpoints/byte12l-pysrc.npz", 0.9339),
]
_only = os.environ.get("LAC_SLIDE_ONLY")  # comma-sep case names
if _only:
    CASES = [c for c in CASES if c[0] in _only.split(",")]

for name, ckpt, shipped in CASES:
    model = resolve_lm(f"file:{ckpt}", None)
    for m in MODES:
        mode, kv8, det8 = (m.split("+")[0], "+kv8" in m, "+det8" in m)
        t0 = time.time()
        c = lm_compress_bytes(
            hdata, model_ref=f"file:{ckpt}", block_tokens=BLOCK,
            lanes=LANES, overlap=bench.FLAGSHIP_OVERLAP,
            model=model, window_mode=mode, kv8=kv8, det8=det8,
            cache_grow=0 if mode == "slide" else 128,
        )
        te = time.time() - t0
        t0 = time.time()
        # the decode handshake upgrades the float model from container flags
        back = lm_decompress_bytes(c, model=model)
        td = time.time() - t0
        ok = back == hdata
        bpb = 8 * len(c) / len(hdata)
        tag = f"{name} {mode}{'+kv8' if kv8 else ''}{'+det8' if det8 else ''}"
        print(f"{tag}: {bpb:.4f} bpb (shipped reprime {shipped}), "
              f"enc {te:.0f}s dec {td:.0f}s, exact={ok}", flush=True)
        assert ok, f"{tag} round-trip mismatch"
        if os.environ.get("LAC_SLIDE_WARM"):
            # second rep on warm executables: separates compile from
            # steady-state wall (VERDICT r3 weak-4: the byte-16l b16k run
            # showed enc 221s vs dec 42s with compile and run conflated)
            t0 = time.time()
            c2 = lm_compress_bytes(
                hdata, model_ref=f"file:{ckpt}", block_tokens=BLOCK,
                lanes=LANES, overlap=bench.FLAGSHIP_OVERLAP,
                model=model, window_mode=mode, kv8=kv8, det8=det8,
                cache_grow=0 if mode == "slide" else 128,
            )
            te2 = time.time() - t0
            t0 = time.time()
            back2 = lm_decompress_bytes(c2, model=model)
            td2 = time.time() - t0
            assert back2 == hdata and c2 == c, f"{tag} warm rep mismatch"
            print(f"{tag} WARM: enc {te2:.0f}s dec {td2:.0f}s "
                  f"(compile share: enc {te - te2:.0f}s dec {td - td2:.0f}s)",
                  flush=True)
