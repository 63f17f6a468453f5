"""Bisect the det8 TPU-worker crash (measurements/r3_slide_det8*.log).

Facts so far: det8+slide CHUNKED encode fine; det8+slide SERIAL decode
crashes the worker at t_len 4096 and 16384; float slide serial decode fine
at both; det8 serial decode at T=256 (round 2) fine. Each case below runs
in a SUBPROCESS so a worker crash costs one case, not the probe.

Cases: (a) det8 plain serial decode T=512 (round-2 class, control);
(b) det8 REPRIME windowed decode block 4096 — what auto now routes det8 to,
must not crash; (c) det8+slide t_len=576 (one wrap past W=512);
(d) det8+slide t_len=1024 (two windows).
"""
import subprocess
import sys

CASE_SRC = r"""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
from lac_tpu.models.lm_registry import resolve_lm
from lac_tpu.runtime.lm_engine import lm_decode_windowed, lm_encode_windowed

kind, t_len = sys.argv[1], int(sys.argv[2])
cfg, params = resolve_lm("prng:byte-12l:0", None)
import dataclasses
cfg = dataclasses.replace(cfg, det8=True)
rng = np.random.default_rng(1)
B = 16
tokens = rng.integers(0, 256, (B, t_len)).astype(np.int32)
lengths = np.full(B, t_len, np.int32)
mode = "slide" if kind == "slide" else "reprime"
w, _ = lm_encode_windowed(cfg, params, tokens, lengths, 16, overlap=8, mode=mode)
print("encode ok", flush=True)
out = np.asarray(lm_decode_windowed(
    cfg, params, np.asarray(w), lengths, 16, t_len, overlap=8, mode=mode))
assert (out == tokens).all()
print("decode ok, exact", flush=True)
"""

CASES = [
    ("det8-plain-serial-T512", "reprime", 512),     # t_len == max_seq: plain path
    ("det8-reprime-windowed-4096", "reprime", 4096),
    ("det8-slide-576", "slide", 576),
    ("det8-slide-1024", "slide", 1024),
]

for name, kind, t_len in CASES:
    r = subprocess.run(
        [sys.executable, "-c", CASE_SRC, kind, str(t_len)],
        capture_output=True, text=True, timeout=2400,
    )
    tail = (r.stdout.strip().splitlines() or [""])[-1]
    err = (r.stderr.strip().splitlines() or [""])[-1][:160]
    print(f"{name}: rc={r.returncode} [{tail}] {err if r.returncode else ''}",
          flush=True)
