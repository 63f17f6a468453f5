"""Forward-pass ablation probe (float path, byte-12l, B=256): where does
the per-step time go?

Measured context (BASELINE.md): forward = 96% of the encode step; per-step
HBM traffic ~80MB (56MB bf16 weights + ~24MB KV) -> ~0.1ms at the 819GB/s
roof, but the measured step is ~1.9ms. This probe times jitted 256-step
scans of forward VARIANTS to locate the gap:

  full        : the real inference forward (unrolled layers)
  no_attn     : attention replaced by identity (keeps projections? no - the
                whole _attention call skipped; isolates attention+cache)
  no_mlp      : MLP skipped
  no_head     : final head matmul skipped (returns hidden state sum)
  no_cache    : cache never updated (no DUS; attention over zeros)
  half_layers : 6 of 12 layers
  matmul_sol  : the bare matmul sequence of one step at B=256 (qkvo + mlp
                + head as dense chains x12) - the speed-of-light reference

Run with the TPU idle (timings are meaningless under contention).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from lac_tpu.models.lm_registry import PRESETS
from lac_tpu.models import transformer as T

B, STEPS = 256, 256
cfg = dataclasses.replace(PRESETS["byte-12l"](), max_seq=256)
params = T.init_params(cfg, jax.random.PRNGKey(0))


def time_scan(step_fn, label, cache_width=256):
    @functools.partial(jax.jit, static_argnums=())
    def run(params, toks):
        cache = T.init_cache(cfg, B, cache_width)

        def body(carry, tok):
            cache, x = carry
            out, cache = step_fn(params, tok[:, None], cache)
            return (cache, out), ()

        (cache, out), _ = jax.lax.scan(body, (cache, jnp.zeros((B,), jnp.float32)), toks.T)
        return out

    toks = jnp.asarray(np.random.default_rng(0).integers(0, 256, (B, STEPS)), jnp.int32)
    r = run(params, toks)
    float(jnp.sum(r))  # sync
    t0 = time.perf_counter()
    r = run(params, toks)
    float(jnp.sum(r))
    dt = time.perf_counter() - t0
    print(f"{label:12s} {dt*1e3:8.1f} ms  {B*STEPS/dt/1e3:7.1f}k tok/s  {dt/STEPS*1e3:6.3f} ms/step", flush=True)
    return dt


def full_step(params, tok, cache):
    logits, cache = T.forward(cfg, params, tok, cache)
    return jnp.sum(logits[:, 0].astype(jnp.float32), axis=-1), cache


def make_variant(skip_attn=False, skip_mlp=False, skip_head=False,
                 skip_cache=False, layers=None):
    def step(params, tok, cache):
        x = params["embed"][tok].astype(cfg.dtype)
        pos = cache["pos"]
        nl = layers if layers is not None else cfg.n_layers
        fks, fvs = [], []
        for li in range(nl):
            lp = jax.tree.map(lambda a: a[li], params["layers"])
            ck, cv = cache["k"][li], cache["v"][li]
            if not skip_attn:
                h, fk, fv = T._attention(cfg, lp, T._norm(cfg, lp["ln1"], x), ck, cv, pos, False)
                x = x + h
            else:
                fk = jnp.zeros((B, 1, cfg.n_kv_heads, cfg.head_dim), cfg.dtype)
                fv = fk
            fks.append(fk); fvs.append(fv)
            if not skip_mlp:
                x = x + T._mlp(cfg, lp, T._norm(cfg, lp["ln2"], x))
        x = T._norm(cfg, params["final_norm"], x)
        if not skip_head:
            wh = params["embed"][: cfg.vocab].T
            logits = jnp.dot(x.astype(cfg.dtype), wh.astype(cfg.dtype),
                             preferred_element_type=jnp.float32)
            out = jnp.sum(logits[:, 0], axis=-1)
        else:
            out = jnp.sum(x[:, 0].astype(jnp.float32), axis=-1)
        z = jnp.zeros((), jnp.int32)
        if not skip_cache:
            fk = jnp.stack(fks)[: cfg.n_layers]
            fv = jnp.stack(fvs)[: cfg.n_layers]
            if layers is not None and layers < cfg.n_layers:
                pad = cfg.n_layers - layers
                fk = jnp.concatenate([fk, jnp.zeros((pad,) + fk.shape[1:], cfg.dtype)])
                fv = jnp.concatenate([fv, jnp.zeros((pad,) + fv.shape[1:], cfg.dtype)])
            cache = {
                "k": jax.lax.dynamic_update_slice(cache["k"], fk, (z, z, pos, z, z)),
                "v": jax.lax.dynamic_update_slice(cache["v"], fv, (z, z, pos, z, z)),
                "pos": pos + jnp.int32(1),
            }
        else:
            cache = dict(cache, pos=pos + jnp.int32(1))
        return out, cache

    return step


def matmul_sol(params, tok, cache):
    """Bare per-step dense chain: the same weight matmuls the real step does
    (q/k/v/o + mlp per layer + head), nothing else. k/v feed an accumulator
    so XLA cannot dead-code them."""
    x = params["embed"][tok].astype(cfg.dtype)[:, 0]  # [B, D]
    acc = jnp.zeros((B,), jnp.float32)
    for li in range(cfg.n_layers):
        lp = jax.tree.map(lambda a: a[li], params["layers"])
        q = jnp.dot(x, lp["wq"], preferred_element_type=jnp.float32).astype(cfg.dtype)
        k = jnp.dot(x, lp["wk"], preferred_element_type=jnp.float32)
        v = jnp.dot(x, lp["wv"], preferred_element_type=jnp.float32)
        acc = acc + jnp.sum(k, axis=-1) + jnp.sum(v, axis=-1)
        x = jnp.dot(q, lp["wo"], preferred_element_type=jnp.float32).astype(cfg.dtype)
        up = jnp.dot(x, lp["w_up"], preferred_element_type=jnp.float32).astype(cfg.dtype)
        gate = jnp.dot(x, lp["w_gate"], preferred_element_type=jnp.float32).astype(cfg.dtype)
        x = jnp.dot(jax.nn.silu(gate.astype(jnp.float32)).astype(cfg.dtype) * up,
                    lp["w_down"], preferred_element_type=jnp.float32).astype(cfg.dtype)
    wh = params["embed"][: cfg.vocab].T
    logits = jnp.dot(x, wh.astype(cfg.dtype), preferred_element_type=jnp.float32)
    return jnp.sum(logits, axis=-1) + acc, dict(cache, pos=cache["pos"] + jnp.int32(1))


if __name__ == "__main__":
    print(f"byte-12l float ablation: B={B}, {STEPS}-step jitted scans", flush=True)
    time_scan(full_step, "full")
    time_scan(make_variant(), "rebuilt")  # sanity: rebuilt == full-ish
    time_scan(make_variant(skip_attn=True), "no_attn")
    time_scan(make_variant(skip_mlp=True), "no_mlp")
    time_scan(make_variant(skip_head=True), "no_head")
    time_scan(make_variant(skip_cache=True), "no_cache")
    time_scan(make_variant(layers=6), "half_layers")
    time_scan(matmul_sol, "matmul_sol")
