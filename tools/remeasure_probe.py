"""Round-4 auditability re-measures (VERDICT r3 items 8 + 9) in ONE process
(one service-side first-compile stall budgeted, per the measured harness
behavior): every row here replaces a BASELINE.md figure that still cites an
uncommitted scratch/*.log.

  1. cache_grow row: byte-12l float lock-step coding, fixed-width vs
     cache_grow=128, same process (round-2 claim: +21%/+14%).
  2. kv8 row + the encode/decode gap (BENCH_r03: 237.6k enc vs 194.5k dec):
     stage split — interval collection alone (forward+gather, the shared
     work) vs full encode vs full decode names whether the decode deficit
     is the coder stage (in-kernel CDF search + rANS pop) or the forward.
  3. training throughput: 40 timed steps of the byte-16l recipe shapes
     (B=32 x seq 2048; round-2 claim: ~45.7k tok/s).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import dataclasses

import jax.numpy as jnp
import numpy as np

import bench
from lac_tpu.models.lm_registry import resolve_lm, PRESETS
from lac_tpu.runtime.lm_engine import (GROW_BUCKET, _encode_intervals_grown,
                                       lm_decode, lm_encode)

B, T, PB = 256, 256, 16
cfg, params = resolve_lm("file:checkpoints/byte12l-pysrc.npz", T)
data = bench.build_corpus(B * T)
toks = np.frombuffer(data, np.uint8).astype(np.int32).reshape(B, T)
lens = np.full((B,), T, np.int32)


def timed(fn, label, reps=3):
    fn()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
    s = (time.perf_counter() - t0) / reps
    print(f"{label}: {B * T / s / 1e3:.1f}k tok/s ({s * 1e3:.0f} ms)", flush=True)
    return s


def enc(c, p, grow):
    def f():
        w, nw = lm_encode(c, p, toks, lens, PB, cache_grow=grow)
        return int(jnp.sum(nw)), w
    return f


def dec(c, p, w, grow):
    def f():
        d = lm_decode(c, p, w, lens, PB, T, cache_grow=grow)
        return int(jnp.sum(d)), d
    return f


# --- 1. cache_grow ---------------------------------------------------------
print("== cache_grow (byte-12l float, B=256 T=256) ==", flush=True)
timed(enc(cfg, params, 0), "fixed-width encode")
timed(enc(cfg, params, GROW_BUCKET), "cache_grow=128 encode")
_, wfix = enc(cfg, params, 0)()
_, wgrow = enc(cfg, params, GROW_BUCKET)()
wfix, wgrow = np.asarray(wfix), np.asarray(wgrow)
timed(dec(cfg, params, wfix, 0), "fixed-width decode")
timed(dec(cfg, params, wgrow, GROW_BUCKET), "cache_grow=128 decode")
_, dg = dec(cfg, params, wgrow, GROW_BUCKET)()
assert (np.asarray(dg) == toks).all(), "grow round-trip mismatch"

# --- 2. kv8 + the enc/dec gap ----------------------------------------------
print("== kv8 (byte-12l, B=256 T=256, cache_grow=128) ==", flush=True)
kcfg = dataclasses.replace(cfg, kv8=True)
timed(enc(kcfg, params, GROW_BUCKET), "kv8 encode")
_, wk = enc(kcfg, params, GROW_BUCKET)()
wk = np.asarray(wk)
timed(dec(kcfg, params, wk, GROW_BUCKET), "kv8 decode")
_, dk = dec(kcfg, params, wk, GROW_BUCKET)()
assert (np.asarray(dk) == toks).all(), "kv8 round-trip mismatch"


def intervals_only():
    lo, f = _encode_intervals_grown(kcfg, params, jnp.asarray(toks), PB,
                                    GROW_BUCKET)
    return int(jnp.sum(f[:, -1])), None


timed(intervals_only, "kv8 intervals only (forward+quantize+gather)")
# encode = intervals + rANS emit; decode = the same forward + in-kernel CDF
# search + rANS pop fused into the scan — the deltas name the gap's owner.

# --- 3. training throughput --------------------------------------------------
print("== training throughput (byte-16l shapes: B=32 x seq 2048) ==", flush=True)
from lac_tpu.train import train_byte_lm

tcfg = dataclasses.replace(PRESETS["byte-16l"](), max_seq=2049)
corpus = bench.build_corpus(64 << 20)
# warmup call first: it pays the one-time compile (cache MISS) so the two
# timed calls below both trace + cache-HIT — only then does subtracting
# cancel the per-call fixed cost (the first version skipped this and
# measured a negative s/step: r4_remeasure.log)
train_byte_lm(tcfg, corpus, steps=1, batch=32, seq=2048, log_every=0)
t0 = time.perf_counter()
train_byte_lm(tcfg, corpus, steps=5, batch=32, seq=2048, log_every=0)
t5 = time.perf_counter() - t0
print(f"  5 steps (warm): {t5:.0f}s", flush=True)
t0 = time.perf_counter()
train_byte_lm(tcfg, corpus, steps=50, batch=32, seq=2048, log_every=0)
t50 = time.perf_counter() - t0
s = (t50 - t5) / 45
print(f"train: {32 * 2048 / s / 1e3:.1f}k tok/s ({s:.2f} s/step)", flush=True)
