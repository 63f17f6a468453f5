"""Bisect the TinyLlama B=128 w8 round-trip mismatch (r4_tinyllama_b128.log,
reproduced r4_tinyllama_b128_try2.log on a healthy worker).

A weight-quantization bug cannot break a round-trip (both sides run the same
math), so the suspects are (a) cross-graph float drift — encode's scan body
and decode's scan body embed the same _step_cdf in different programs, and
XLA is only guaranteed deterministic within ONE compiled schedule — or (b) a
mode-specific schedule bug (cache_grow geometry, w8 route). The matrix
separates them:

  w8 x cache_grow   <- the failing config
  w8 x fixed-width
  float x cache_grow
  float x fixed-width

each at B=128 T=256, reporting the first mismatching (lane, position) and
the mismatch count; a drift bug shows as a mid-stream divergence in some
lanes, a schedule bug as structured (e.g. bucket-boundary-aligned) errors.
Decode runs twice to catch run-to-run nondeterminism.
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

B = int(os.environ.get("LAC_TLM_B", "128"))
T = int(os.environ.get("LAC_TLM_T", "256"))
PB = 17

cfg, params = resolve_lm("prng:tinyllama:0", max_seq=T)
rng = np.random.default_rng(0)
toks = rng.integers(0, cfg.vocab, (B, T)).astype(np.int32)
lens = np.full((B,), T, np.int32)

for w8 in (True, False):
    mcfg = dataclasses.replace(cfg, w8=w8)
    mp = ensure_w8(mcfg, params)
    for grow in (GROW_BUCKET, 0):
        tag = f"{'w8' if w8 else 'bf16'} grow={grow}"
        t0 = time.time()
        w, nw = lm_encode(mcfg, mp, toks, lens, PB, cache_grow=grow)
        int(jnp.sum(nw))
        wn = np.asarray(w)
        d1 = np.asarray(lm_decode(mcfg, mp, wn, lens, PB, T, cache_grow=grow))
        d2 = np.asarray(lm_decode(mcfg, mp, wn, lens, PB, T, cache_grow=grow))
        rerun = "decode-deterministic" if (d1 == d2).all() else "DECODE NONDET"
        bad = d1 != toks
        if bad.any():
            lanes = np.unique(np.argwhere(bad)[:, 0])
            first = np.argwhere(bad)[np.argmin(np.argwhere(bad)[:, 1])]
            per_lane_first = [int(np.argmax(bad[l])) for l in lanes[:8]]
            print(f"{tag}: MISMATCH {bad.sum()} syms in {len(lanes)}/{B} "
                  f"lanes; first (lane,pos)={tuple(int(x) for x in first)}; "
                  f"per-lane first pos {per_lane_first}; {rerun} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        else:
            print(f"{tag}: exact; {rerun} ({time.time()-t0:.0f}s)", flush=True)
