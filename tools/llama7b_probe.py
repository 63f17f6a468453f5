"""Llama-2-7B capability proof on one v5e chip (VERDICT round-2 item 5;
BASELINE config #4; reference target llama_compress.py:9).

bf16 weights are ~13.5 GB against ~16 GB HBM, so the probe starts small and
reports exactly what fits: instantiate the full 32-layer 7B architecture
with deterministic random weights, run lock-step coding steps (the real
engine path: forward -> quantize -> CDF -> rANS feedback), and measure
tok/s at the largest batch that fits. Weights are initialized DIRECTLY on
device via jit (a host-side init would need 13.5 GB of host RAM and a
13.5 GB tunnel upload).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from lac_tpu.models.lm_registry import PRESETS
from lac_tpu.models.transformer import init_params
from lac_tpu.runtime.lm_engine import lm_decode, lm_encode

B = int(os.environ.get("LAC_7B_B", "4"))
T = int(os.environ.get("LAC_7B_T", "128"))
PB = 17

cfg = PRESETS["llama2-7b"]()
import dataclasses

cfg = dataclasses.replace(cfg, max_seq=T)
nparams = (
    (cfg.vocab + 1) * cfg.d_model + cfg.d_model * cfg.vocab
    + cfg.n_layers * (4 * cfg.d_model * cfg.d_model + 3 * cfg.d_model * cfg.d_ff)
)
print(f"llama2-7b arch: {nparams/1e9:.2f}B params, bf16 {2*nparams/2**30:.1f} GiB",
      flush=True)

rng = np.random.default_rng(0)
toks = rng.integers(0, cfg.vocab, (B, T)).astype(np.int32)
lens = np.full((B,), T, np.int32)


def run(cfg, params, tag):
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
    # roofline math (VERDICT r3 item 5): per-step HBM traffic vs BW. The
    # serial-attention cache read is first-class here — 7B is MHA, so at
    # B=32 the per-step K/V read (2 x L x B x W x d x dtype) rivals the
    # weight stream; kv8 halves it and cfg.cache_grow shrinks W early.
    nbytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
    kvb = 1 if cfg.kv8 else 2
    cache_bytes = 2 * cfg.n_layers * B * T * cfg.n_kv_heads * (
        cfg.d_model // cfg.n_heads) * kvb
    for rtag, tput in (("encode", B * T / te), ("decode", B * T / td)):
        fw = (tput / B) * nbytes / 819e9
        fwc = (tput / B) * (nbytes + cache_bytes) / 819e9
        print(f"{tag} roofline {rtag}: {tput:.0f} tok/s x {nbytes/1e9:.1f} "
              f"GB weights (+{cache_bytes/1e9:.1f} GB full-width cache read) "
              f"/step / 819 GB/s = {100*fw:.0f}% of weight-stream, "
              f"{100*fwc:.0f}% of weights+cache bound", flush=True)


# w8: int8 weights (6.7 GB) + bf16 cache fits comfortably. Init and
# quantize are FUSED in one jit so the 13.5 GB float tree only ever exists
# as per-layer XLA intermediates (holding both full trees would OOM HBM).
from lac_tpu.models.transformer import ensure_w8

wcfg = dataclasses.replace(cfg, w8=True,
                           kv8=os.environ.get("LAC_7B_KV8", "0") == "1")
t0 = time.time()
wparams = jax.block_until_ready(
    jax.jit(lambda key: ensure_w8(wcfg, init_params(wcfg, key)))(
        jax.random.PRNGKey(0))
)
print(f"on-device init+w8-quantize {time.time()-t0:.0f}s", flush=True)
run(wcfg, wparams, "w8")

if os.environ.get("LAC_7B_BF16", "0") == "1":
    # optional: the bf16 tree alone is ~13.5/16 GB — borderline with cache
    del wparams
    params = jax.block_until_ready(
        jax.jit(init_params, static_argnums=0)(cfg, jax.random.PRNGKey(0)))
    run(cfg, params, "bf16")
