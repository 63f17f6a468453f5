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

__all__ = ["ScanModel", "Order0Scan", "MarkovScan"]


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
