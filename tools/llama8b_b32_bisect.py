"""Bisect the Llama-3-8B B=32 compile wedge (VERDICT r3 item 4: the B=32
encode first-compile ran >26 min and was killed, r3_llama8b_b32.log; the
hypothesis is the [32, 128256] prob_bits-18 quantize/CDF stage).

Compiles the candidate stages SEPARATELY in one process, printing wall time
per stage as it goes, so the log shows exactly which compile wedges:
  1. quantize_logits + cdf_from_freq + gather_intervals at [B, 128256]
     standalone (the hypothesized culprit — round 1 bisected the same
     pattern to a pathological standalone exp at [256, 32000]).
  2. one single-token forward step at B (no coder).
  3. the full fused encode (lm_encode graph).
Stage order matters: each is its own executable, so a wedge in (1) is
visible before (3) starts. Run with a generous external timeout.
"""
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from lac_tpu.models.lm_registry import PRESETS
from lac_tpu.models.transformer import ensure_w8, init_cache, init_params
from lac_tpu.ops.quantize import cdf_from_freq, gather_intervals, quantize_logits
from lac_tpu.runtime.lm_engine import _step_cdf, lm_decode, lm_encode

B = int(os.environ.get("LAC_8B_B", "32"))
T = int(os.environ.get("LAC_8B_T", "128"))
PB = 18

cfg = dataclasses.replace(PRESETS["llama3-8b"](), max_seq=T, w8=True)
t0 = time.time()
params = jax.jit(lambda key: ensure_w8(cfg, init_params(cfg, key)))(
    jax.random.PRNGKey(0))
int(jnp.sum(jax.tree.leaves(params)[0][..., 0].astype(jnp.int32)))
print(f"init+w8 {time.time()-t0:.0f}s", flush=True)

# stage 1: coder stage standalone at [B, V]
@jax.jit
def coder_stage(logits, syms):
    freq = quantize_logits(logits, PB)
    lo, f = gather_intervals(cdf_from_freq(freq), syms)
    return lo.astype(jnp.int32) + f.astype(jnp.int32)

rng = np.random.default_rng(0)
logits = jnp.asarray(rng.normal(size=(B, cfg.vocab)).astype(np.float32))
syms1 = jnp.asarray(rng.integers(0, cfg.vocab, (B,)).astype(np.int32))
t0 = time.time()
int(jnp.sum(coder_stage(logits, syms1)))
print(f"stage1 coder-standalone [{B},{cfg.vocab}] compile+run "
      f"{time.time()-t0:.0f}s", flush=True)

# stage 2: one model step (forward + quantize + cdf), the scan body
@jax.jit
def one_step(params, prev):
    cache = init_cache(cfg, B, 128)
    cdf, _ = _step_cdf(cfg, params, cache, prev, PB)
    return jnp.sum(cdf[:, -1])

prev = jnp.asarray(rng.integers(0, cfg.vocab, (B,)).astype(np.int32))
t0 = time.time()
int(one_step(params, prev))
print(f"stage2 one-model-step B={B} compile+run {time.time()-t0:.0f}s",
      flush=True)

# stage 3: the full fused encode + decode round-trip
toks = rng.integers(0, cfg.vocab, (B, T)).astype(np.int32)
lens = np.full((B,), T, np.int32)
t0 = time.time()
w, nw = lm_encode(cfg, params, toks, lens, PB)
int(jnp.sum(nw))
print(f"stage3 full encode compile+run {time.time()-t0:.0f}s", flush=True)
t0 = time.time()
w, nw = lm_encode(cfg, params, toks, lens, PB)
int(jnp.sum(nw))
te = time.time() - t0
print(f"encode warm: {B*T/te:.1f} tok/s ({te:.1f}s)", flush=True)
wn = np.asarray(w)
t0 = time.time()
d = lm_decode(cfg, params, wn, lens, PB, T)
int(jnp.sum(d))
print(f"decode compile+run {time.time()-t0:.0f}s", flush=True)
t0 = time.time()
d = lm_decode(cfg, params, wn, lens, PB, T)
int(jnp.sum(d))
td = time.time() - t0
assert (np.asarray(d) == toks).all(), "round-trip mismatch"
print(f"decode warm: {B*T/td:.1f} tok/s ({td:.1f}s); round-trip exact",
      flush=True)
# roofline math (VERDICT r3 item 5): tok/s x bytes-per-step / 819 GB/s
nbytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
for tag, tput in (("encode", B * T / te), ("decode", B * T / td)):
    frac = (tput / B) * nbytes / 819e9
    print(f"roofline {tag}: {tput:.0f} tok/s x {nbytes/1e9:.1f} GB/step "
          f"/ 819 GB/s = {100*frac:.0f}% of weight-stream bound", flush=True)
