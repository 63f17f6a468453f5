"""TinyLlama-1.1B lock-step coding at its design batch (VERDICT round-2
item 4; BASELINE config #3). One process, warm compile cache budgeted for a
single first-compile stall; B from env (default 256).

Roofline context: the 1.1B bf16 forward streams ~2.2 GB of weights per
step; v5e HBM ~819 GB/s gives a weights-bound ceiling of ~372 steps/s =
B*372 tok/s (95k at B=256) ignoring KV traffic.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp

from lac_tpu.models.lm_registry import resolve_lm
from lac_tpu.runtime.lm_engine import GROW_BUCKET, lm_decode, lm_encode

B = int(os.environ.get("LAC_TL_B", "256"))
T = int(os.environ.get("LAC_TL_T", "256"))
PB = 17  # vocab 32000 needs 2^pb >= 2V

cfg, params = resolve_lm("prng:tinyllama:0", max_seq=T)
rng = np.random.default_rng(0)
toks = rng.integers(0, cfg.vocab, (B, T)).astype(np.int32)
lens = np.full((B,), T, np.int32)

print(f"TinyLlama B={B} T={T}: compiling encode...", flush=True)
t0 = time.time()
w, nw = lm_encode(cfg, params, toks, lens, PB, cache_grow=GROW_BUCKET)
int(jnp.sum(nw))
print(f"encode compile+run {time.time()-t0:.0f}s", flush=True)
t0 = time.time()
w, nw = lm_encode(cfg, params, toks, lens, PB, cache_grow=GROW_BUCKET)
int(jnp.sum(nw))
te = time.time() - t0
print(f"encode: {B*T/te:.0f} tok/s ({te:.1f}s)", flush=True)

wn = np.asarray(w)
t0 = time.time()
d = lm_decode(cfg, params, wn, lens, PB, T, cache_grow=GROW_BUCKET)
int(jnp.sum(d))
print(f"decode compile+run {time.time()-t0:.0f}s", flush=True)
t0 = time.time()
d = lm_decode(cfg, params, wn, lens, PB, T, cache_grow=GROW_BUCKET)
int(jnp.sum(d))
td = time.time() - t0
assert (np.asarray(d) == toks).all(), "round-trip mismatch"
print(f"decode: {B*T/td:.0f} tok/s ({td:.1f}s); round-trip exact", flush=True)

# w8 (+kv8) speed modes in the same process: the weights-bound regime is
# exactly where int8 weights should pay
import dataclasses

from lac_tpu.models.transformer import ensure_w8

for modes in ({"w8": True}, {"w8": True, "kv8": True}):
    mcfg = dataclasses.replace(cfg, **modes)
    mp = ensure_w8(mcfg, params)  # quantize once, outside the timed region
    tag = "+".join(modes)
    t0 = time.time()
    w, nw = lm_encode(mcfg, mp, toks, lens, PB, cache_grow=GROW_BUCKET)
    int(jnp.sum(nw))
    print(f"{tag} encode compile+run {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    w, nw = lm_encode(mcfg, mp, toks, lens, PB, cache_grow=GROW_BUCKET)
    int(jnp.sum(nw))
    te = time.time() - t0
    wn = np.asarray(w)
    d = lm_decode(mcfg, mp, wn, lens, PB, T, cache_grow=GROW_BUCKET)
    int(jnp.sum(d))
    t0 = time.time()
    d = lm_decode(mcfg, mp, wn, lens, PB, T, cache_grow=GROW_BUCKET)
    int(jnp.sum(d))
    td = time.time() - t0
    assert (np.asarray(d) == toks).all(), f"{tag} round-trip mismatch"
    print(f"{tag}: encode {B*T/te:.0f} tok/s, decode {B*T/td:.0f} tok/s; exact",
          flush=True)
