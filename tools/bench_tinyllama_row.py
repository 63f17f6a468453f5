"""Subprocess bench row: TinyLlama-1.1B w8 lock-step coding on one chip
(BASELINE config #3: batched block-parallel coding at its design batch).
Prints ONE JSON line; bench.py runs this under a hard timeout so a wedged
remote compile (the known harness failure mode) costs one row, not the
round. B=128 is the proven-compiling batch (B=256 first-compiles wedged 4x
across rounds 2-3 — service-side stall class, BASELINE.md); the persistent
compile cache (.jax_cache) makes this row cheap when the round's probe run
already compiled the same shapes.

Roofline: the w8 forward streams ~1.1 GB of weights per step; v5e HBM
~819 GB/s bounds it at ~745 steps/s = B*745 tok/s ignoring KV traffic.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import dataclasses

import jax.numpy as jnp

from lac_tpu.models.lm_registry import resolve_lm
from lac_tpu.models.transformer import ensure_w8
from lac_tpu.runtime.lm_engine import GROW_BUCKET, lm_decode, lm_encode

B = int(os.environ.get("LAC_TLROW_B", "128"))
T = int(os.environ.get("LAC_TLROW_T", "256"))
PB = 17  # vocab 32000 needs 2^pb >= 2V

cfg, params = resolve_lm("prng:tinyllama:0", max_seq=T)
cfg = dataclasses.replace(cfg, w8=True)
params = ensure_w8(cfg, params)
rng = np.random.default_rng(0)
toks = rng.integers(0, cfg.vocab, (B, T)).astype(np.int32)
lens = np.full((B,), T, np.int32)

w, nw = lm_encode(cfg, params, toks, lens, PB, cache_grow=GROW_BUCKET)
int(jnp.sum(nw))
t0 = time.perf_counter()
w, nw = lm_encode(cfg, params, toks, lens, PB, cache_grow=GROW_BUCKET)
int(jnp.sum(nw))
te = time.perf_counter() - t0
wn = np.asarray(w)
d = lm_decode(cfg, params, wn, lens, PB, T, cache_grow=GROW_BUCKET)
int(jnp.sum(d))
t0 = time.perf_counter()
d = lm_decode(cfg, params, wn, lens, PB, T, cache_grow=GROW_BUCKET)
int(jnp.sum(d))
td = time.perf_counter() - t0
assert (np.asarray(d) == toks).all(), "round-trip mismatch"
print(json.dumps({
    "lm_tinyllama_w8_encode_tok_s": round(B * T / te, 1),
    "lm_tinyllama_w8_decode_tok_s": round(B * T / td, 1),
    "lm_tinyllama_batch": B,
}))
