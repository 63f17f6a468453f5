"""Round-5 VERDICT item 2a: per-stage profile of the Llama-3-8B B=64
lock-step coding step (the 40%-of-roofline row, r4_llama8b_b64.log).

Stages timed in one process (staged init keeps the bf16 ghost to one
layer — transformer.init_params_w8):
  full encode     — the shipped path (forward + quantize/CDF/gather + rANS)
  forward-only    — the same serial scan with the coder stage replaced by a
                    cheap logits reduction (isolates the model)
  coder-only      — quantize_logits -> cdf_from_freq -> gather_intervals on
                    [B, 128256] logits, T steps scanned in one jit (a
                    per-step perturbation defeats loop-invariant hoisting)
  rANS emit       — _encode_rans on precomputed intervals
  full decode     — the serial-bound side

NOTE if run concurrently with a training run, absolute tok/s are contended;
the STAGE SHARES are the signal (r4 precedent: the 7B B=4 re-run shared the
chip and still beat its r3 number).
"""
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

from lac_tpu.models.lm_registry import PRESETS
from lac_tpu.models.transformer import forward, init_cache, init_params_w8
from lac_tpu.ops.quantize import cdf_from_freq, gather_intervals, quantize_logits
from lac_tpu.runtime.lm_engine import _encode_intervals, _encode_rans, lm_decode, lm_encode
from lac_tpu.runtime.lm_api import auto_prob_bits

B = int(os.environ.get("LAC_8B_B", "64"))
T = int(os.environ.get("LAC_8B_T", "128"))

cfg = PRESETS["llama3-8b"]()
cfg = dataclasses.replace(cfg, max_seq=T, w8=True)
PB = auto_prob_bits(cfg, 16)
print(f"devices: {jax.devices()}  B={B} T={T} prob_bits={PB}", flush=True)

t0 = time.time()
params = init_params_w8(cfg, jax.random.PRNGKey(0))
int(jnp.sum(jax.tree.leaves(params)[0][..., 0].astype(jnp.int32)))
print(f"staged init+w8 quantize {time.time()-t0:.0f}s", flush=True)

rng = np.random.default_rng(0)
toks = rng.integers(0, cfg.vocab, (B, T)).astype(np.int32)
lens = np.full((B,), T, np.int32)


def timed(tag, fn, reps=1):
    t0 = time.time()
    fn()
    c = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    dt = (time.time() - t0) / reps
    print(f"{tag}: {dt:.2f}s = {B*T/dt:.0f} tok/s (first {c:.0f}s)", flush=True)
    return dt


import lac_tpu.runtime.lm_engine as E

with jax.enable_x64(True):
    # full encode
    def full_enc():
        w, nw = lm_encode(cfg, params, toks, lens, PB)
        int(jnp.sum(nw))
        return w
    t_full = timed("full encode  ", full_enc)
    w, nw = lm_encode(cfg, params, toks, lens, PB)
    wn = np.asarray(w)

    # forward-only serial scan (same cache geometry as _encode_intervals)
    @jax.jit
    def fwd_only(params, tokens):
        b = tokens.shape[0]
        cache = init_cache(cfg, b, -(-tokens.shape[1] // 128) * 128)

        def step(carry, tok_t):
            cache, prev = carry
            logits, cache = forward(cfg, params, prev[:, None], cache)
            return (cache, tok_t), jnp.sum(logits[:, 0, ::4096])

        (_, _), s = lax.scan(step, (cache, jnp.full((b,), cfg.bos_id, jnp.int32)),
                             jnp.asarray(toks).T)
        return jnp.sum(s)

    t_fwd = timed("forward-only ", lambda: float(fwd_only(params, jnp.asarray(toks))))

    # coder-only: T chained quantize->cdf->gather on [B, V] logits
    cache0 = init_cache(cfg, B, 128)
    logits0, _ = jax.jit(forward, static_argnums=0)(
        cfg, params, jnp.asarray(toks[:, :1]), cache0)
    logits0 = logits0[:, 0, :]

    @jax.jit
    def coder_only(logits, tokens):
        def step(acc, tok_t):
            lg = logits + tok_t[:, None].astype(jnp.float32) * jnp.float32(1e-6)
            freq = quantize_logits(lg, PB)
            cdf = cdf_from_freq(freq)
            lo, f = gather_intervals(cdf, tok_t)
            return acc + jnp.sum(lo.astype(jnp.int64)) + jnp.sum(f.astype(jnp.int64)), None

        acc, _ = lax.scan(step, jnp.int64(0), tokens.T)
        return acc

    t_coder = timed("coder-only   ", lambda: int(coder_only(logits0, jnp.asarray(toks))))

    # rANS emit on precomputed intervals
    lo, f = _encode_intervals(cfg, params, jnp.asarray(toks), jnp.asarray(lens), PB)
    lo.block_until_ready()

    def rans_only():
        wr, nwr = _encode_rans(lo, f, jnp.asarray(lens), PB, T + 2)
        int(jnp.sum(nwr))
    t_rans = timed("rANS emit    ", rans_only)

    # full decode
    def full_dec():
        d = lm_decode(cfg, params, wn, lens, PB, T)
        int(jnp.sum(d))
        return d
    t_dec = timed("full decode  ", full_dec)
    d = lm_decode(cfg, params, wn, lens, PB, T)
    assert (np.asarray(d) == toks).all(), "round-trip mismatch"
    print("round-trip exact", flush=True)

print(f"shares of encode: forward {t_fwd/t_full:.0%}, coder {t_coder/t_full:.0%}, "
      f"rANS {t_rans/t_full:.0%}, residual "
      f"{(t_full-t_fwd-t_coder-t_rans)/t_full:.0%}", flush=True)
print("profile done", flush=True)
