"""Functional (scan-able) predictors for the batched device coding path.

This is the TPU-native predictor protocol (SURVEY.md §7.3): a model is a
pure-function triple over an explicit state pytree —

    init_state(batch) -> state
    cdf(state)        -> int32 [B, V+1] exclusive-prefix, total 2**prob_bits
    update(state, sym [B]) -> state

so the engine can run it inside ``lax.scan`` lock-step with the rANS coder
for B independent streams at once. The object predictors in classical.py are
the host-side oracles for the same models; tests assert the two agree.

The integer guard here is the closed-form variant of ops.rescale_cdf:

    scaled[j] = (cum[j] * (denom - V)) // total + j

which is monotone with every width >= 1 and exact total ``denom`` — fully
vectorized (no loop-carried clamp). Pure integer state => bit-deterministic
on every backend.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp
from jax import lax

__all__ = [
    "ScanModel",
    "Order0Scan",
    "MarkovScan",
    "Order0Decay",
    "MarkovDecay",
    "Order0CDF",
    "MarkovCDF",
    "CDF_STATE_BITS",
    "cdf_state_init",
    "cdf_state_to_coder",
    "cdf_state_update",
    "NIB_V",
    "NIB_STATE_BITS",
    "NIB_CODE_BITS",
    "nib_state_init",
    "nib_state_to_coder",
    "nib_state_update",
    "Order0NibCDF",
    "Order1NibCDF",
    "Order2NibCDF",
]


def _cumsum(x: jnp.ndarray) -> jnp.ndarray:
    """Last-axis cumulative sum via associative_scan (log-depth shifted
    adds). XLA lowers jnp.cumsum to a padded reduce-window whose scoped VMEM
    blows the 16MB limit on TPU when nested inside lax.scan bodies."""
    return lax.associative_scan(jnp.add, x, axis=-1)


def _closed_rescale(cum: jnp.ndarray, total: jnp.ndarray, denom: int, v: int):
    """cum: [..., V+1] int64 inclusive-prefix with leading 0; total [..., 1].
    Returns int32 [..., V+1] exclusive-prefix CDF with total ``denom``."""
    j = jnp.arange(v + 1, dtype=jnp.int64)
    scaled = (cum * jnp.int64(denom - v)) // total + j
    return scaled.astype(jnp.int32)


@dataclass(frozen=True)
class ScanModel:
    """Base: static hyperparams only (hashable => usable as jit static)."""

    vocab: int
    prob_bits: int

    def init_state(self, batch: int) -> Any:
        raise NotImplementedError

    def cdf(self, state) -> jnp.ndarray:
        raise NotImplementedError

    def update(self, state, syms: jnp.ndarray):
        raise NotImplementedError


@dataclass(frozen=True)
class Order0Scan(ScanModel):
    """Adaptive order-0: freq(s) = count(s) + 1 (Laplace), matching
    classical.AdaptiveOrder0. State: int32 counts [B, V]."""

    inc: int = 1

    def init_state(self, batch: int):
        return jnp.zeros((batch, self.vocab), dtype=jnp.int32)

    def cdf(self, state):
        c = _cumsum((state + 1).astype(jnp.int64))
        cum = jnp.concatenate([jnp.zeros_like(c[:, :1]), c], axis=-1)
        total = cum[:, -1:]
        return _closed_rescale(cum, total, 1 << self.prob_bits, self.vocab)

    def update(self, state, syms):
        onehot = (jnp.arange(self.vocab, dtype=jnp.int32)[None, :] == syms[:, None])
        return state + onehot.astype(jnp.int32) * jnp.int32(self.inc)


@dataclass(frozen=True)
class MarkovScan(ScanModel):
    """Adaptive order-1 Markov: freq(s | prev) = count(prev, s) + 1.
    State: (counts [B, V, V] int32, prev [B] int32). The scan-able
    counterpart of classical.MarkovMix's capability (context modeling) in
    its simplest deterministic form; higher orders via hashing come with the
    context-mixing model."""

    def init_state(self, batch: int):
        counts = jnp.zeros((batch, self.vocab, self.vocab), dtype=jnp.int32)
        prev = jnp.zeros((batch,), dtype=jnp.int32)
        return (counts, prev)

    def cdf(self, state):
        counts, prev = state
        row = jnp.take_along_axis(
            counts, prev[:, None, None], axis=1
        )[:, 0, :]  # [B, V]
        c = _cumsum((row + 1).astype(jnp.int64))
        cum = jnp.concatenate([jnp.zeros_like(c[:, :1]), c], axis=-1)
        return _closed_rescale(cum, cum[:, -1:], 1 << self.prob_bits, self.vocab)

    def update(self, state, syms):
        counts, prev = state
        b = counts.shape[0]
        lane = jnp.arange(b)
        counts = counts.at[lane, prev, syms].add(1)
        return (counts, syms)


# --------------------------------------------------------------------------
# Decay models: division-free adaptive predictors.
#
# The counts-based models above need an integer rescale (a division per CDF
# entry) because their totals grow. On TPU, 64-bit divides are emulated at
# ~50+ ops each — the measured hot cost of the whole byte path. The decay
# models keep the frequency table summing to EXACTLY 2**prob_bits as an
# invariant, so the table IS the coder CDF: no rescale, no division, int32
# only. Update rule (exponential forgetting, like context-mixing coders):
#
#     dec_i  = max(freq_i >> rate, min(freq_i - 1, 1))   # >=0, keeps freq>=1
#     freq  <- freq - dec + onehot(sym) * sum(dec)        # total preserved
#
# Forgetting also adapts to local statistics, which usually *beats* pure
# counts on real data. ``rate`` trades adaptation speed vs noise.
# --------------------------------------------------------------------------


def _uniform_pow2(batch: int, v: int, total: int) -> jnp.ndarray:
    base, rem = divmod(total, v)
    if base < 1:
        raise ValueError(f"prob_bits too small for vocab {v}")
    row = jnp.full((v,), base, dtype=jnp.int32).at[:rem].add(1)
    return jnp.broadcast_to(row, (batch, v))


def _decay_update(freq: jnp.ndarray, syms: jnp.ndarray, rate: int, v: int):
    dec = jnp.maximum(freq >> rate, jnp.minimum(freq - 1, 1))
    # dtype pinned: jnp.sum would promote i32 -> i64 under the coder's x64
    inc = jnp.sum(dec, axis=-1, keepdims=True, dtype=jnp.int32)
    onehot = (jnp.arange(v, dtype=jnp.int32)[None, :] == syms[:, None])
    return freq - dec + onehot.astype(jnp.int32) * inc


def _freq_to_cdf(freq: jnp.ndarray) -> jnp.ndarray:
    c = _cumsum(freq)
    return jnp.concatenate([jnp.zeros_like(c[..., :1]), c], axis=-1)


@dataclass(frozen=True)
class Order0Decay(ScanModel):
    """Division-free adaptive order-0 model (the fast byte-path default)."""

    rate: int = 4

    def init_state(self, batch: int):
        return _uniform_pow2(batch, self.vocab, 1 << self.prob_bits)

    def cdf(self, state):
        return _freq_to_cdf(state)

    def update(self, state, syms):
        return _decay_update(state, syms, self.rate, self.vocab)


@dataclass(frozen=True)
class MarkovDecay(ScanModel):
    """Division-free adaptive order-1 model: one decay table per previous
    symbol. State: (freq [B, V, V] int32, prev [B] int32)."""

    rate: int = 4

    def init_state(self, batch: int):
        freq = _uniform_pow2(batch * self.vocab, self.vocab, 1 << self.prob_bits)
        return (freq.reshape(batch, self.vocab, self.vocab), jnp.zeros((batch,), jnp.int32))

    def cdf(self, state):
        freq, prev = state
        row = jnp.take_along_axis(freq, prev[:, None, None], axis=1)[:, 0, :]
        return _freq_to_cdf(row)

    def update(self, state, syms):
        freq, prev = state
        row = jnp.take_along_axis(freq, prev[:, None, None], axis=1)[:, 0, :]
        row = _decay_update(row, syms, self.rate, self.vocab)
        b = freq.shape[0]
        freq = freq.at[jnp.arange(b), prev].set(row)
        return (freq, syms)


# --------------------------------------------------------------------------
# Shift-to-target CDF models (the Pallas-kernel byte-path models).
#
# The state IS the CDF: interior boundaries state[k] (k = 1..V-1, endpoints
# 0 and 2**15 implicit), total fixed at 2**15 forever. Adaptation moves each
# boundary toward the one-hot CDF of the observed symbol by a power-of-two
# step (the AV1/Daala entropy-coder adaptation family):
#
#     k <= s:  state[k] -= state[k] >> rate        (toward 0)
#     k >  s:  state[k] += (2**15 - state[k]) >> rate  (toward total)
#
# which preserves monotonicity and the total exactly. Zero widths are
# allowed in the state; the coder map restores the >=1-width guarantee
# without any division because the state total is a power of two:
#
#     eff[j] = (state[j] * (2**prob_bits - V)) >> 15 + j      (j = 0..V)
#
# No cumsum (state is already cumulative), no division, no gather — every
# per-step op is an elementwise mask/shift/reduce, which is exactly what a
# fused Pallas decode kernel wants. Max product 2**15 * (2**16 - V) < 2**31
# keeps everything in int32 (requires prob_bits <= 16).
# --------------------------------------------------------------------------

# The state lives DIRECTLY in the coder's fixed-point domain: state[j] is
# the j'th CDF boundary in [0, 2**prob_bits - V], and the coder CDF is just
# state + iota (the +j term provides the >=1-width guard). Keeping the state
# pre-scaled removes a [V, B] multiply+shift from every kernel step compared
# to a separate model domain; the shift-to-target update preserves
# monotonicity and the [0, M] range, so every symbol width stays >= 1.
CDF_STATE_BITS = 15  # retained for capacity docs; the domain is pb-derived


def _cdf_m(prob_bits: int, v: int) -> int:
    return (1 << prob_bits) - v


def cdf_state_init(batch: int, v: int, prob_bits: int = 16) -> jnp.ndarray:
    """Uniform initial state: [B, V+1] int32 with fixed endpoints 0, M."""
    j = jnp.arange(v + 1, dtype=jnp.int32)
    row = (j * _cdf_m(prob_bits, v)) // v
    return jnp.broadcast_to(row, (batch, v + 1))


def cdf_state_to_coder(state: jnp.ndarray, prob_bits: int, v: int) -> jnp.ndarray:
    """[B, V+1] state -> [B, V+1] coder CDF with total 2**prob_bits and
    every width >= 1 (a single iota add: the state is pre-scaled)."""
    j = jnp.arange(v + 1, dtype=jnp.int32)
    return state + j


def cdf_state_update(state: jnp.ndarray, syms: jnp.ndarray, rate, v: int,
                     prob_bits: int = 16):
    """Move boundaries toward the observed symbol's one-hot CDF."""
    k = jnp.arange(v + 1, dtype=jnp.int32)[None, :]
    toward_zero = state - (state >> rate)
    toward_total = state + ((_cdf_m(prob_bits, v) - state) >> rate)
    return jnp.where(k <= syms[:, None], toward_zero, toward_total)


def adaptive_rate(base_rate, step):
    """AV1-style rate schedule: adapt fast on a cold model, slow down as the
    block ages so a converged model stops chasing noise (the fixed-rate
    variant expands incompressible data ~1.5x; this bounds it near 1.0)."""
    step = jnp.asarray(step, dtype=jnp.int32)
    bump = (
        (step >= 16).astype(jnp.int32)
        + (step >= 32).astype(jnp.int32)
        + (step >= 64).astype(jnp.int32)
        + (step >= 128).astype(jnp.int32)
    )
    return base_rate + bump


@dataclass(frozen=True)
class Order0CDF(ScanModel):
    """Adaptive order-0 shift-to-target model (fast byte-path default).
    State carries a step counter driving the adaptive rate schedule."""

    rate: int = 4

    def init_state(self, batch: int):
        return (
            cdf_state_init(batch, self.vocab, self.prob_bits),
            jnp.zeros((), jnp.int32),
        )

    def cdf(self, state):
        return cdf_state_to_coder(state[0], self.prob_bits, self.vocab)

    def update(self, state, syms):
        cdf, step = state
        r = adaptive_rate(self.rate, step)
        return (
            cdf_state_update(cdf, syms, r, self.vocab, self.prob_bits),
            step + 1,
        )


# --------------------------------------------------------------------------
# Nibble-factorized shift-to-target model ("order0n", codec 3's model).
#
# A byte s = 16*h + l is modeled as P(h) * P(l | h): one hi-nibble CDF plus
# 16 context-conditioned lo-nibble CDFs (fully expressive — any joint byte
# distribution factorizes this way). The win is kernel geometry: per coded
# byte the adaptive-model work drops from [256, B] vector ops to a few
# [16, B] ops plus one context extract/writeback, ~2x decode throughput
# (see ops/pallas_rans o0n kernels).
#
# The two 8-bit nibble intervals COMPOSE into a single 16-bit rANS step:
#
#     lo12 = (lo_h << 8) + f_h * lo_l        f12 = f_h * f_l
#
# which tiles [0, 2**16) exactly (for fixed h, l-intervals scaled by f_h
# tile [lo_h*256, (lo_h+f_h)*256)), so the coder layer — rANS-32/16 spec,
# dense-grid encode, word compaction, container — is IDENTICAL to codec 2's.
# The composed 257-entry CDF is monotone with every width >= 1 (both nibble
# CDFs carry the +k guard), so the generic vector coder works on it too.
#
# States are kept at 15-bit precision internally (AV1-family adaptation
# dynamics need headroom: an 8-bit state freezes under the late-schedule
# rates) and scaled to the 8-bit coding domain per step:
#
#     eff[k] = (state[k] * (256 - 16)) >> 15 + k,   eff[16] = 256 implicit.
#
# The hi table adapts on the global step schedule; each lo table adapts on
# its own visit count (context maturity) — measured worth ~2% ratio over a
# global-step rate on text.
# --------------------------------------------------------------------------

NIB_V = 16  # nibble alphabet
NIB_STATE_BITS = 15  # internal state precision
NIB_CODE_BITS = 8  # per-nibble coding precision (composed prob_bits = 16)
_NIB_S = 1 << NIB_STATE_BITS
_NIB_M = (1 << NIB_CODE_BITS) - NIB_V  # 240


def nib_state_init(batch: int) -> jnp.ndarray:
    """Uniform 15-bit nibble CDF state: [B, 17] int32, endpoints 0 / 2**15."""
    j = jnp.arange(NIB_V + 1, dtype=jnp.int32)
    return jnp.broadcast_to((j * _NIB_S) // NIB_V, (batch, NIB_V + 1))


def nib_state_to_coder(state: jnp.ndarray) -> jnp.ndarray:
    """15-bit state [..., 17] -> 8-bit coding CDF (total 256, widths >= 1)."""
    j = jnp.arange(NIB_V + 1, dtype=jnp.int32)
    return ((state * _NIB_M) >> NIB_STATE_BITS) + j


def nib_state_update(state: jnp.ndarray, nib, rate) -> jnp.ndarray:
    """Move 15-bit boundaries toward the observed nibble's one-hot CDF.
    ``nib``: [...] int32; ``rate``: scalar or [..., 1] per-lane column."""
    k = jnp.arange(NIB_V + 1, dtype=jnp.int32)
    toward_zero = state - (state >> rate)
    toward_total = state + ((_NIB_S - state) >> rate)
    return jnp.where(k <= nib[..., None], toward_zero, toward_total)


@dataclass(frozen=True)
class Order0NibCDF(ScanModel):
    """Nibble-factorized adaptive byte model (codec 3, model id "order0n").
    vocab must be 256; cdf() returns the composed 257-entry CDF with total
    2**prob_bits (prob_bits must be 16)."""

    rate: int = 4

    def __post_init__(self):
        if self.vocab != 256 or self.prob_bits != 16:
            raise ValueError("Order0NibCDF requires vocab=256, prob_bits=16")

    def init_state(self, batch: int):
        sh = nib_state_init(batch)  # [B, 17]
        sl = jnp.broadcast_to(
            nib_state_init(1)[0], (batch, NIB_V, NIB_V + 1)
        )  # [B, 16, 17]
        cnt = jnp.zeros((batch, NIB_V), jnp.int32)
        return (sh, sl, cnt, jnp.zeros((), jnp.int32))

    def cdf(self, state):
        sh, sl, _cnt, _step = state
        b = sh.shape[0]
        effh = nib_state_to_coder(sh)  # [B, 17]
        effl = nib_state_to_coder(sl)  # [B, 16, 17]
        s = jnp.arange(256, dtype=jnp.int32)
        hs, ls = s >> 4, s & 15
        loh = effh[:, hs]  # [B, 256]
        fh = effh[:, hs + 1] - loh
        lol = effl[:, hs, ls]  # [B, 256]
        cdf = (loh << 8) + fh * lol
        total = jnp.full((b, 1), 1 << 16, dtype=jnp.int32)
        return jnp.concatenate([cdf, total], axis=-1)

    def update(self, state, syms):
        sh, sl, cnt, step = state
        h, l = syms >> 4, syms & 15
        rh = adaptive_rate(self.rate, step)
        sh = nib_state_update(sh, h, rh)
        b = sh.shape[0]
        lane = jnp.arange(b)
        row = sl[lane, h]  # [B, 17]
        c = cnt[lane, h]  # [B]
        rl = adaptive_rate(self.rate, c)[:, None]
        row = nib_state_update(row, l, rl)
        sl = sl.at[lane, h].set(row)
        cnt = cnt.at[lane, h].add(1)
        return (sh, sl, cnt, step + 1)


@dataclass(frozen=True)
class Order1NibCDF(ScanModel):
    """Order-1 nibble-factorized byte model (codec "order1n"): the hi
    nibble is conditioned on the PREVIOUS byte's hi nibble (16 contexts,
    the same binary-tree context machinery as the lo tables), the lo nibble
    on the current hi nibble. Strictly dominates the joint-byte order0c
    model on measured corpora: better ratio (h|prev_h captures most of the
    order-1 signal at 1/16 the state) AND faster kernels ([16, B]-class
    ops). Both tables adapt on per-context visit counts."""

    rate: int = 4

    def __post_init__(self):
        if self.vocab != 256 or self.prob_bits != 16:
            raise ValueError("Order1NibCDF requires vocab=256, prob_bits=16")

    def init_state(self, batch: int):
        row = nib_state_init(1)[0]
        sh = jnp.broadcast_to(row, (batch, NIB_V, NIB_V + 1))
        sl = jnp.broadcast_to(row, (batch, NIB_V, NIB_V + 1))
        cnth = jnp.zeros((batch, NIB_V), jnp.int32)
        cntl = jnp.zeros((batch, NIB_V), jnp.int32)
        prev_h = jnp.zeros((batch,), jnp.int32)
        return (sh, sl, cnth, cntl, prev_h)

    def cdf(self, state):
        sh, sl, _cnth, _cntl, prev_h = state
        b = sh.shape[0]
        lane = jnp.arange(b)
        effh = nib_state_to_coder(sh[lane, prev_h])  # [B, 17]
        effl = nib_state_to_coder(sl)  # [B, 16, 17]
        s = jnp.arange(256, dtype=jnp.int32)
        hs, ls = s >> 4, s & 15
        loh = effh[:, hs]
        fh = effh[:, hs + 1] - loh
        lol = effl[:, hs, ls]
        cdf = (loh << 8) + fh * lol
        total = jnp.full((b, 1), 1 << 16, dtype=jnp.int32)
        return jnp.concatenate([cdf, total], axis=-1)

    def update(self, state, syms):
        sh, sl, cnth, cntl, prev_h = state
        h, l = syms >> 4, syms & 15
        b = sh.shape[0]
        lane = jnp.arange(b)
        hrow = sh[lane, prev_h]
        ch = cnth[lane, prev_h]
        hrow = nib_state_update(hrow, h, adaptive_rate(self.rate, ch)[:, None])
        sh = sh.at[lane, prev_h].set(hrow)
        cnth = cnth.at[lane, prev_h].add(1)
        lrow = sl[lane, h]
        cl = cntl[lane, h]
        lrow = nib_state_update(lrow, l, adaptive_rate(self.rate, cl)[:, None])
        sl = sl.at[lane, h].set(lrow)
        cntl = cntl.at[lane, h].add(1)
        return (sh, sl, cnth, cntl, h)


@dataclass(frozen=True)
class Order2NibCDF(ScanModel):
    """Order-2-lite nibble-factorized byte model (codec "order2n"): the hi
    nibble is conditioned on the previous byte's hi nibble (16 contexts,
    as order1n) and the LO nibble on (current hi, previous hi >> 2) — 64
    contexts. Simulated on python-source at block 4096: 4.19 bits/byte vs
    order1n's 4.26 (full (h, prev_h) conditioning reaches 4.16 but costs a
    256-row context table whose per-step tree extract/writeback traffic is
    ~16x; the 64-row table is the measured ratio/traffic knee). Designed
    for LARGER blocks than the other turbo codecs (default 4096): at block
    1024 the extra contexts dilute below order1n — measured, not a bug."""

    rate: int = 4

    def __post_init__(self):
        if self.vocab != 256 or self.prob_bits != 16:
            raise ValueError("Order2NibCDF requires vocab=256, prob_bits=16")

    def init_state(self, batch: int):
        row = nib_state_init(1)[0]
        sh = jnp.broadcast_to(row, (batch, NIB_V, NIB_V + 1))
        sl = jnp.broadcast_to(row, (batch, 4 * NIB_V, NIB_V + 1))
        cnth = jnp.zeros((batch, NIB_V), jnp.int32)
        cntl = jnp.zeros((batch, 4 * NIB_V), jnp.int32)
        prev_h = jnp.zeros((batch,), jnp.int32)
        return (sh, sl, cnth, cntl, prev_h)

    def cdf(self, state):
        sh, sl, _cnth, _cntl, prev_h = state
        b = sh.shape[0]
        lane = jnp.arange(b)
        effh = nib_state_to_coder(sh[lane, prev_h])  # [B, 17]
        effl = nib_state_to_coder(sl)  # [B, 64, 17]
        s = jnp.arange(256, dtype=jnp.int32)
        hs, ls = s >> 4, s & 15
        loh = effh[:, hs]
        fh = effh[:, hs + 1] - loh
        lc = hs[None, :] * 4 + (prev_h[:, None] >> 2)  # [B, 256]
        lol = effl[lane[:, None], lc, ls[None, :]]
        cdf = (loh << 8) + fh * lol
        total = jnp.full((b, 1), 1 << 16, dtype=jnp.int32)
        return jnp.concatenate([cdf, total], axis=-1)

    def update(self, state, syms):
        sh, sl, cnth, cntl, prev_h = state
        h, l = syms >> 4, syms & 15
        b = sh.shape[0]
        lane = jnp.arange(b)
        hrow = sh[lane, prev_h]
        ch = cnth[lane, prev_h]
        hrow = nib_state_update(hrow, h, adaptive_rate(self.rate, ch)[:, None])
        sh = sh.at[lane, prev_h].set(hrow)
        cnth = cnth.at[lane, prev_h].add(1)
        lc = h * 4 + (prev_h >> 2)
        lrow = sl[lane, lc]
        cl = cntl[lane, lc]
        lrow = nib_state_update(lrow, l, adaptive_rate(self.rate, cl)[:, None])
        sl = sl.at[lane, lc].set(lrow)
        cntl = cntl.at[lane, lc].add(1)
        return (sh, sl, cnth, cntl, h)


@dataclass(frozen=True)
class MarkovCDF(ScanModel):
    """Order-1 shift-to-target model: one CDF state row per previous symbol,
    with a per-context maturity counter driving the rate schedule."""

    rate: int = 4

    def init_state(self, batch: int):
        row = cdf_state_init(1, self.vocab, self.prob_bits)[0]
        table = jnp.broadcast_to(row, (batch, self.vocab, self.vocab + 1))
        counts = jnp.zeros((batch, self.vocab), jnp.int32)
        return (table, jnp.zeros((batch,), jnp.int32), counts)

    def cdf(self, state):
        table, prev, _counts = state
        row = jnp.take_along_axis(table, prev[:, None, None], axis=1)[:, 0, :]
        return cdf_state_to_coder(row, self.prob_bits, self.vocab)

    def update(self, state, syms):
        table, prev, counts = state
        row = jnp.take_along_axis(table, prev[:, None, None], axis=1)[:, 0, :]
        cnt = jnp.take_along_axis(counts, prev[:, None], axis=1)  # [B, 1]
        r = adaptive_rate(self.rate, cnt)  # per-lane rate column
        row = cdf_state_update(row, syms, r, self.vocab, self.prob_bits)
        b = table.shape[0]
        lane = jnp.arange(b)
        table = table.at[lane, prev].set(row)
        counts = counts.at[lane, prev].add(1)
        return (table, syms, counts)
