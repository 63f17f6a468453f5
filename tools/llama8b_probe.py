"""Llama-3-8B capability proof on one v5e chip (BASELINE config #5's model,
single-chip leg; reference target class: llama_compress.py:9 scaled up).

Same protocol as tools/llama7b_probe.py (the config-#4 row): instantiate the
full 32-layer GQA architecture with deterministic random weights DIRECTLY on
device (init + w8 int8 quantization fused in one jit so the ~16 GiB bf16
tree never materializes), then run real lock-step coding round-trips
(forward -> quantize -> CDF -> rANS feedback) and report tok/s.

8B specifics vs 7B: GQA (8 KV heads), d_ff 14336, vocab 128256 — the w8
tree is ~8.0 GiB resident; the 128k-entry CDF rows make quantize/gather
4x wider than the 32k-vocab models.
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
from lac_tpu.models.transformer import ensure_w8, init_params
from lac_tpu.runtime.lm_engine import lm_decode, lm_encode

B = int(os.environ.get("LAC_8B_B", "4"))
T = int(os.environ.get("LAC_8B_T", "128"))

cfg = PRESETS["llama3-8b"]()
cfg = dataclasses.replace(cfg, max_seq=T)
from lac_tpu.runtime.lm_api import auto_prob_bits

PB = auto_prob_bits(cfg, 16)  # 128256-token vocab -> 18
print(f"prob_bits {PB}", flush=True)

rng = np.random.default_rng(0)
toks = rng.integers(0, cfg.vocab, (B, T)).astype(np.int32)
lens = np.full((B,), T, np.int32)


def run(cfg, params, tag):
    nparams = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    print(f"{tag}: {nparams/1e9:.2f}B params resident", flush=True)
    t0 = time.time()
    w, nw = lm_encode(cfg, params, toks, lens, PB)
    int(jnp.sum(nw))
    print(f"{tag} encode compile+run {time.time()-t0:.0f}s (B={B}, T={T})",
          flush=True)
    t0 = time.time()
    w, nw = lm_encode(cfg, params, toks, lens, PB)
    int(jnp.sum(nw))
    te = time.time() - t0
    print(f"{tag} encode: {B*T/te:.1f} tok/s ({te:.1f}s)", flush=True)
    wn = np.asarray(w)
    t0 = time.time()
    d = lm_decode(cfg, params, wn, lens, PB, T)
    int(jnp.sum(d))
    print(f"{tag} decode compile+run {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    d = lm_decode(cfg, params, wn, lens, PB, T)
    int(jnp.sum(d))
    td = time.time() - t0
    assert (np.asarray(d) == toks).all(), "round-trip mismatch"
    print(f"{tag} decode: {B*T/td:.1f} tok/s ({td:.1f}s); round-trip exact",
          flush=True)


wcfg = dataclasses.replace(cfg, w8=True)
t0 = time.time()
# STAGED init (round 5): the one-shot fused init+quantize jit holds the
# ~16 GiB bf16 ghost tree and ResourceExhausted at B=96
# (measurements/r4_llama8b_b96.log); init_params_w8 initializes+quantizes
# one layer per dispatch with the accumulator donated
from lac_tpu.models.transformer import init_params_w8

wparams = init_params_w8(wcfg, jax.random.PRNGKey(0))
# block_until_ready does NOT wait through the axon tunnel (measured env
# fact); sync with a scalar fetch on one leaf so the init timer is honest
int(jnp.sum(jax.tree.leaves(wparams)[0][..., 0].astype(jnp.int32)))
print(f"on-device staged init+w8-quantize {time.time()-t0:.0f}s", flush=True)
run(wcfg, wparams, "w8")
