"""Per-stage profile of the windowed LM coding paths (ratio config).

Round-3 finding to explain: at block 4096 / w512 / ov8 / lanes 256 the
end-to-end corpus run measured encode 0.041 MB/s vs decode 0.011 MB/s
(measurements/r3_lm_corpus10.log) while the NON-windowed lock-step paths
are symmetric (decode/encode = 0.99, BASELINE.md per-step profile row).
This probe times one wave's windowed encode and decode and, separately,
the stages they are made of:

  - reprime: `_reprime_cdf` (448-token prefill, fresh cache) x n_segs
  - enc_seg: `_seg_intervals` 64-step serial scan x n_segs
  - dec_seg: `_seg_decode` 64-step serial scan (forward + in-kernel CDF
    search + rANS pops) x n_segs
  - first window: 512-step serial scan (both sides)

Whatever stage accounts for the asymmetry is the optimization target.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import bench
from lac_tpu.models.lm_registry import resolve_lm
from lac_tpu.runtime import lm_engine as le
from lac_tpu.runtime.lm_engine import (
    lm_decode_windowed, lm_encode_windowed, window_schedule)

B = int(os.environ.get("LAC_WP_LANES", "256"))
T = int(os.environ.get("LAC_WP_BLOCK", "4096"))
OV = int(os.environ.get("LAC_WP_OVERLAP", "8"))
PB = 16
MODEL = os.environ.get("LAC_WP_MODEL", "file:checkpoints/byte12l-pysrc.npz")

cfg, params = resolve_lm(MODEL, None)
data = bench.build_corpus(B * T)
toks = np.frombuffer(data, dtype=np.uint8).reshape(B, T).astype(np.int32)
lens = np.full((B,), T, np.int32)

segs, keep = window_schedule(T, cfg.max_seq, OV)
n_re = sum(1 for _, _, r in segs if r)
print(f"B={B} T={T} window={cfg.max_seq} ov={OV}: {len(segs)} segs "
      f"({n_re} re-primes, keep={keep})", flush=True)


def sync(x):
    int(jnp.sum(x))


# ---- end-to-end (after a warm-up wave each) --------------------------------
w, nw = lm_encode_windowed(cfg, params, toks, lens, PB, overlap=OV)
sync(nw)
t0 = time.time()
w, nw = lm_encode_windowed(cfg, params, toks, lens, PB, overlap=OV)
sync(nw)
te = time.time() - t0
print(f"encode_windowed: {te:.1f}s  ({B*T/te/1e3:.1f}k tok/s)", flush=True)

wn = np.asarray(w)
d = lm_decode_windowed(cfg, params, wn, lens, PB, T, overlap=OV)
sync(d)
assert (np.asarray(d) == toks).all()
t0 = time.time()
d = lm_decode_windowed(cfg, params, wn, lens, PB, T, overlap=OV)
sync(d)
td = time.time() - t0
print(f"decode_windowed: {td:.1f}s  ({B*T/td/1e3:.1f}k tok/s)  "
      f"dec/enc = {td/te:.2f}", flush=True)

# ---- stages (under the engine's scoped x64: the rANS state is uint64) ------
import contextlib

stack = contextlib.ExitStack()
stack.enter_context(jax.enable_x64(True))
params8 = le.ensure_w8(cfg, params)
toks_j = jnp.asarray(toks)
kept = toks_j[:, :keep]
steps_tail = cfg.max_seq - keep  # 64 at ov8

# re-prime prefill
cdf, cache = le._reprime_cdf(cfg, params8, kept, PB)
sync(cdf)
t0 = time.time()
for _ in range(4):
    cdf, cache = le._reprime_cdf(cfg, params8, kept, PB)
sync(cdf)
t_re = (time.time() - t0) / 4
print(f"reprime ({keep} tok prefill): {t_re*1e3:.1f} ms  "
      f"x{n_re} segs = {t_re*n_re:.1f}s/wave", flush=True)

# encode segment scan
prev = toks_j[:, keep]
seg_toks = toks_j[:, keep + 1: keep + 1 + steps_tail]
c2, p2, lo, f = le._seg_intervals(cfg, params8, cache, prev, seg_toks, PB, steps_tail)
sync(lo)
t0 = time.time()
for _ in range(4):
    c2, p2, lo, f = le._seg_intervals(cfg, params8, cache, prev, seg_toks, PB, steps_tail)
sync(lo)
t_enc = (time.time() - t0) / 4
print(f"enc_seg ({steps_tail} steps): {t_enc*1e3:.1f} ms  "
      f"x{n_re} = {t_enc*n_re:.1f}s/wave", flush=True)

# decode segment scan (same cache/shape; rstate from the real words)
rstate = le.rans_decode_init.__wrapped__(jnp.asarray(wn, dtype=jnp.uint32))
c3, p3, rs3, syms = le._seg_decode(
    cfg, params8, cache, prev, rstate, PB, steps_tail,
    jnp.int32(keep + 1), jnp.asarray(lens))
sync(syms)
t0 = time.time()
for _ in range(4):
    c3, p3, rs3, syms = le._seg_decode(
        cfg, params8, cache, prev, rstate, PB, steps_tail,
        jnp.int32(keep + 1), jnp.asarray(lens))
sync(syms)
t_dec = (time.time() - t0) / 4
print(f"dec_seg ({steps_tail} steps): {t_dec*1e3:.1f} ms  "
      f"x{n_re} = {t_dec*n_re:.1f}s/wave  dec_seg/enc_seg = {t_dec/t_enc:.2f}",
      flush=True)

# first-window serial scans for completeness
first = segs[0][1]
c0 = le.init_cache(cfg, B)
p0 = jnp.full((B,), cfg.bos_id, dtype=jnp.int32)
_, _, lo0, _ = le._seg_intervals(cfg, params8, c0, p0, toks_j[:, :first], PB, first)
sync(lo0)
t0 = time.time()
_, _, lo0, _ = le._seg_intervals(cfg, params8, c0, p0, toks_j[:, :first], PB, first)
sync(lo0)
t_first = time.time() - t0
print(f"first-window enc scan ({first} steps): {t_first:.2f}s", flush=True)

acc_enc = t_first + n_re * (t_re + t_enc)
acc_dec = t_first * (t_dec / t_enc) + n_re * (t_re + t_dec)
print(f"stage-sum: enc {acc_enc:.1f}s (measured {te:.1f}) | "
      f"dec {acc_dec:.1f}s (measured {td:.1f}) — gap = glue "
      f"(concat/dyn-slice/host)", flush=True)
