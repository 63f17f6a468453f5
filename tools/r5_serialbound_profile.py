"""Round-5 VERDICT items 3+6: measure the serial-forward BOUND and place
the engine paths against it.

Item 6 (kv8 lockstep decode gap): BENCH_r04 kv8 rows = encode 235.2k /
decode 195.0k tok/s (byte-12l B=256 T=256 cache_grow=128). Claim to test:
decode == serial-forward bound (encode overlaps the coder with the known
token feed; decode cannot). Measurement: a forward-ONLY serial scan at the
exact decode geometry. If its tok/s ~= 195k, the gap is settled.

Item 3 (corpus LM path): the slide_seg+kv8 windowed path delivers ~80k/73k
tok/s (r4 100MB acceptance) vs 195k lockstep decode. But the lockstep row
runs a GROWING cache averaging ~width 192, while the slide ring is a FIXED
width-512 read per step — a different serial-forward bound. Measurement:
forward-only serial scan over the width-512 ring (kv8 and float), the
engine windowed encode/decode at block 4096, and the e2e bytes path, all
in one process.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

import bench
from lac_tpu.models.lm_registry import resolve_lm
from lac_tpu.models.transformer import forward, init_cache
from lac_tpu.runtime import lm_engine as le
from lac_tpu.runtime.lm_engine import (
    _slide_cfg, lm_decode, lm_decode_windowed, lm_encode, lm_encode_windowed)

B = int(os.environ.get("LAC_SB_LANES", "256"))
T = int(os.environ.get("LAC_SB_BLOCK", "4096"))
PB = 16
import dataclasses

cfgf, params = resolve_lm("file:checkpoints/byte12l-pysrc.npz", None)
cfg8 = dataclasses.replace(cfgf, kv8=True)
print(f"devices: {jax.devices()}  B={B} T={T} window={cfgf.max_seq}", flush=True)

data = bench.build_corpus(B * T)
toks = np.frombuffer(data, dtype=np.uint8).reshape(B, T).astype(np.int32)
lens = np.full((B,), T, np.int32)


def timed(tag, fn, reps=1, n_tok=B * T):
    fn()  # warm/compile
    t0 = time.time()
    for _ in range(reps):
        fn()
    dt = (time.time() - t0) / reps
    print(f"{tag}: {dt:.2f}s = {n_tok/dt/1e3:.1f}k tok/s", flush=True)
    return dt


def fwd_only_scan(cfg, tokens, window, seg, slide):
    """Serial forward-only scan in <=seg-step segments over a `window`-wide
    cache (ring under slide) — the model-only floor of the decode schedule."""
    scfg = _slide_cfg(cfg) if slide else cfg
    b, t_len = tokens.shape

    import functools

    @functools.partial(jax.jit, static_argnums=(3,))
    def seg_run(params, cache, prev, steps, tok_seg):
        def step(carry, tok_t):
            cache, prev = carry
            logits, cache = forward(scfg, params, prev[:, None], cache)
            return (cache, tok_t), jnp.sum(logits[:, 0, ::64])

        (cache, prev), s = lax.scan(step, (cache, prev), tok_seg.T)
        return cache, prev, jnp.sum(s)

    def run():
        cache = init_cache(scfg, b, window)
        prev = jnp.full((b,), scfg.bos_id, jnp.int32)
        outs = []
        i = 0
        while i < t_len:
            n = min(seg, t_len - i)
            cache, prev, s = seg_run(params, cache, prev, n,
                                     jnp.asarray(tokens[:, i:i + n]))
            outs.append(s)
            i += n
        return float(sum(float(x) for x in [jnp.stack(outs).sum()]))

    return run


with jax.enable_x64(True):
    # ---- item 6: lockstep decode geometry (T=256, cache_grow=128) ----
    t256 = toks[:, :256]
    l256 = np.full((B,), 256, np.int32)
    def enc_ls():
        w, nw = lm_encode(cfg8, params, t256, l256, PB, cache_grow=128)
        int(jnp.sum(nw))
        return w
    enc_ls()
    w = lm_encode(cfg8, params, t256, l256, PB, cache_grow=128)[0]
    wn = np.asarray(w)
    timed("lockstep kv8 encode (grow128) ", enc_ls, n_tok=B * 256)
    timed("lockstep kv8 decode (grow128) ",
          lambda: int(jnp.sum(lm_decode(cfg8, params, wn, l256, PB, 256,
                                        cache_grow=128))), n_tok=B * 256)
    # forward-only at the same growing-cache schedule: approximate with the
    # engine's own grown segments but no coder — use fixed width buckets
    for wdt in (256, 128):
        # fixed-width brackets of the grown schedule's ~192 average width
        timed(f"fwd-only serial W={wdt} (kv8)   ",
              fwd_only_scan(cfg8, t256, wdt, 256, slide=False), n_tok=B * 256)
    # ---- item 3: slide ring geometry at block 4096 ----
    timed("slide_seg kv8 engine encode   ",
          lambda: int(jnp.sum(lm_encode_windowed(
              cfg8, params, toks, lens, PB, mode="slide", slide_seg=512)[1])))
    wsl, _ = lm_encode_windowed(cfg8, params, toks, lens, PB, mode="slide",
                                slide_seg=512)
    wsln = np.asarray(wsl)
    timed("slide_seg kv8 engine decode   ",
          lambda: int(jnp.sum(lm_decode_windowed(
              cfg8, params, wsln, lens, PB, T, mode="slide", slide_seg=512))))
    timed("fwd-only serial ring W=512 kv8",
          fwd_only_scan(cfg8, toks, None, 512, slide=True))
    timed("fwd-only serial ring W=512 f  ",
          fwd_only_scan(cfgf, toks, None, 512, slide=True))

# ---- e2e bytes path (host+framing on top of the engine) ----
from lac_tpu.runtime.lm_api import lm_compress_bytes, lm_decompress_bytes

blob = data  # B*T bytes = one wave
def e2e_c():
    return lm_compress_bytes(blob, model_ref="file:checkpoints/byte12l-pysrc.npz",
                             block_tokens=T, lanes=B, window_mode="slide",
                             kv8=True, cache_grow=0)
c = e2e_c()
t0 = time.time(); c = e2e_c(); tc = time.time() - t0
print(f"e2e compress: {tc:.2f}s = {len(blob)/tc/1e6:.3f} MB/s", flush=True)
assert lm_decompress_bytes(c) == blob
t0 = time.time(); out = lm_decompress_bytes(c); td = time.time() - t0
print(f"e2e decompress: {td:.2f}s = {len(blob)/td/1e6:.3f} MB/s", flush=True)
assert out == blob
print("e2e round-trip exact; profile done", flush=True)
