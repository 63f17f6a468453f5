"""Subprocess bench row: Llama-2-7B w8 coding on one chip. Prints ONE JSON
line; bench.py runs this under a hard timeout so a wedged remote compile
(the known harness failure mode) costs one row, not the round."""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import dataclasses

import jax
import jax.numpy as jnp

from lac_tpu.models.lm_registry import PRESETS
from lac_tpu.models.transformer import ensure_w8, init_params
from lac_tpu.runtime.lm_engine import lm_decode, lm_encode

B, T, PB = 4, 128, 17
cfg = dataclasses.replace(PRESETS["llama2-7b"](), max_seq=T, w8=True)
params = jax.block_until_ready(
    jax.jit(lambda key: ensure_w8(cfg, init_params(cfg, key)))(jax.random.PRNGKey(0))
)
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
    "lm_llama2_7b_w8_encode_tok_s": round(B * T / te, 1),
    "lm_llama2_7b_w8_decode_tok_s": round(B * T / td, 1),
    "lm_llama2_7b_batch": B,
}))
