"""GPT-2 124M arch lock-step coding, float vs w8 (BASELINE config #2 speed).

At 50257-vocab the output head ([768, 50257] = 77 MB bf16) plus the rest of
the 124M weights (~250 MB) dominate each step's HBM traffic at small batch;
w8 halves both. B from env (default 32, the round-1 measured point).
"""
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp

from lac_tpu.models.lm_registry import resolve_lm
from lac_tpu.models.transformer import ensure_w8
from lac_tpu.runtime.lm_engine import GROW_BUCKET, lm_decode, lm_encode

B = int(os.environ.get("LAC_GPT2_B", "32"))
T = int(os.environ.get("LAC_GPT2_T", "256"))
PB = 17

cfg, params = resolve_lm("prng:gpt2:0", max_seq=T)
rng = np.random.default_rng(0)
toks = rng.integers(0, cfg.vocab, (B, T)).astype(np.int32)
lens = np.full((B,), T, np.int32)

for tag, mcfg in (("bf16", cfg), ("w8", dataclasses.replace(cfg, w8=True))):
    mp = ensure_w8(mcfg, params)
    t0 = time.time()
    w, nw = lm_encode(mcfg, mp, toks, lens, PB, cache_grow=GROW_BUCKET)
    int(jnp.sum(nw))
    print(f"{tag} encode compile+run {time.time()-t0:.0f}s (B={B}, T={T})",
          flush=True)
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
