"""Subprocess bench row: Llama-3-8B w8 coding on one chip (BASELINE config
#5's single-chip leg — the driver-auditable version of
measurements/r5_llama8b_b96.log). Prints ONE JSON line; bench.py runs this
under a hard timeout so a wedged remote compile costs one row, not the
round. Uses the staged init (transformer.init_params_w8): the one-shot
fused init's bf16 ghost tree OOMs at these shapes (r4_llama8b_b96.log)."""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import dataclasses
import os

import jax
import jax.numpy as jnp

from lac_tpu.models.lm_registry import PRESETS
from lac_tpu.models.transformer import init_params_w8
from lac_tpu.runtime.lm_api import auto_prob_bits
from lac_tpu.runtime.lm_engine import lm_decode, lm_encode

B = int(os.environ.get("LAC_8B_BENCH_B", "96"))
T = 128
cfg = dataclasses.replace(PRESETS["llama3-8b"](), max_seq=T, w8=True)
PB = auto_prob_bits(cfg, 16)  # 128256-entry vocab -> 18
params = init_params_w8(cfg, jax.random.PRNGKey(0))
int(jnp.sum(jax.tree.leaves(params)[0][..., 0].astype(jnp.int32)))
rng = np.random.default_rng(0)
toks = rng.integers(0, cfg.vocab, (B, T)).astype(np.int32)
lens = np.full((B,), T, np.int32)
w, nw = lm_encode(cfg, params, toks, lens, PB)
int(jnp.sum(nw))
t0 = time.perf_counter()
w, nw = lm_encode(cfg, params, toks, lens, PB)
int(jnp.sum(nw))
te = time.perf_counter() - t0
wn = np.asarray(w)
d = lm_decode(cfg, params, wn, lens, PB, T)
int(jnp.sum(d))
t0 = time.perf_counter()
d = lm_decode(cfg, params, wn, lens, PB, T)
int(jnp.sum(d))
td = time.perf_counter() - t0
assert (np.asarray(d) == toks).all(), "round-trip mismatch"
print(json.dumps({
    "lm_llama3_8b_w8_encode_tok_s": round(B * T / te, 1),
    "lm_llama3_8b_w8_decode_tok_s": round(B * T / td, 1),
    "lm_llama3_8b_batch": B,
    "lm_llama3_8b_prob_bits": PB,
}))
