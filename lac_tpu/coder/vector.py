"""Batched rANS-64/32 in JAX — the device coding path.

Bit-for-bit identical to the NumPy spec in rans.py (property-tested), but
runs B independent streams as array lanes under ``jit``:

- encode: one ``lax.scan`` over (reversed) time, O(B) work per step, at most
  one u32 word emitted per lane per step (spec invariant), scatter-add into a
  per-lane word buffer, then a vectorized flip into decode order;
- decode: a single step function (CDF slot search + state update + refill)
  designed to be fused into the model-step loop of the engine — decode is
  token-serial per stream (SURVEY.md §3.2), so all decode throughput comes
  from lane batching.

All functions must be called under scoped x64 (utils.jaxutil.x64) — the
public wrappers here apply it already.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.jaxutil import x64
from .rans import RANS_L

__all__ = [
    "rans_encode_batch",
    "RansDecState",
    "rans_decode_init",
    "rans_decode_step",
    "rans_decode_scan",
]


def _u64(v):
    return jnp.asarray(v, dtype=jnp.uint64)


def _encode_scan(cdf_lo, freq, lengths, prob_bits, cap):
    """Core batched encode. cdf_lo/freq: [B, T] int32; lengths: [B] int32.
    Returns (words [B, cap] u32 in decode order, nwords [B] i32)."""
    b, t_len = freq.shape
    shift = _u64(32)
    pbits = _u64(prob_bits)
    lane = jnp.arange(b)

    def step(carry, xs):
        x, words, pos = carry
        lo, f, t = xs
        active = t < lengths
        f64 = f.astype(jnp.uint64)
        lo64 = lo.astype(jnp.uint64)
        x_max = ((_u64(RANS_L) >> pbits) << shift) * f64
        emit = active & (x >= x_max)
        w = (x & _u64(0xFFFFFFFF)).astype(jnp.uint32)
        # scatter-add: non-emitting lanes add 0 at their current slot
        words = words.at[lane, pos].add(jnp.where(emit, w, jnp.uint32(0)))
        pos = pos + emit.astype(jnp.int32)
        x_ren = jnp.where(emit, x >> shift, x)
        x_new = ((x_ren // f64) << pbits) + (x_ren % f64) + lo64
        x = jnp.where(active, x_new, x)
        return (x, words, pos), None

    x0 = jnp.full((b,), RANS_L, dtype=jnp.uint64)
    words0 = jnp.zeros((b, cap), dtype=jnp.uint32)
    pos0 = jnp.zeros((b,), dtype=jnp.int32)
    ts = jnp.arange(t_len - 1, -1, -1, dtype=jnp.int32)
    xs = (cdf_lo[:, ::-1].T, freq[:, ::-1].T, ts)
    (x, words, pos), _ = lax.scan(step, (x0, words0, pos0), xs)

    # push final state: low word then high word
    words = words.at[lane, pos].add((x & _u64(0xFFFFFFFF)).astype(jnp.uint32))
    pos = pos + 1
    words = words.at[lane, pos].add((x >> shift).astype(jnp.uint32))
    nwords = pos + 1

    # flip each lane's first nwords[b] entries into decode order
    idx = nwords[:, None] - 1 - jnp.arange(cap)[None, :]
    valid = idx >= 0
    out = jnp.take_along_axis(words, jnp.maximum(idx, 0), axis=1)
    out = jnp.where(valid, out, jnp.uint32(0))
    return out, nwords


_encode_scan_jit = jax.jit(_encode_scan, static_argnums=(3, 4))


@x64
def rans_encode_batch(cdf_lo, freq, lengths, prob_bits: int):
    """Encode B streams. ``cdf_lo``/``freq``: [B, T] (the coded symbol's
    quantized interval per position, forward order); ``lengths``: [B].
    Returns (words [B, T+2] uint32 in decode order, nwords [B] int32)."""
    cdf_lo = jnp.asarray(cdf_lo, dtype=jnp.int32)
    freq = jnp.asarray(freq, dtype=jnp.int32)
    lengths = jnp.asarray(lengths, dtype=jnp.int32)
    cap = freq.shape[1] + 2
    return _encode_scan_jit(cdf_lo, freq, lengths, prob_bits, cap)


class RansDecState(NamedTuple):
    x: jax.Array      # [B] uint64
    words: jax.Array  # [B, cap] uint32, decode order
    pos: jax.Array    # [B] int32 — next word index


@x64
def rans_decode_init(words) -> RansDecState:
    words = jnp.asarray(words, dtype=jnp.uint32)
    x = (words[:, 0].astype(jnp.uint64) << _u64(32)) | words[:, 1].astype(jnp.uint64)
    pos = jnp.full((words.shape[0],), 2, dtype=jnp.int32)
    return RansDecState(x, words, pos)


def _decode_step(state: RansDecState, cdf, prob_bits, active):
    """One decode step for all lanes. ``cdf``: [B, V+1] int32 exclusive-prefix
    with total 2**prob_bits. Returns (sym [B] int32, new state)."""
    x, words, pos = state
    mask = _u64((1 << prob_bits) - 1)
    slot = (x & mask).astype(jnp.int32)
    # symbol = count of cdf entries <= slot, minus 1: a vectorized compare+
    # reduce beats vmapped searchsorted on TPU (no per-row while loop), and
    # [B, V] compares are negligible next to the model forward
    sym = (jnp.sum(cdf <= slot[:, None], axis=-1, dtype=jnp.int32) - 1).astype(jnp.int32)
    lo = jnp.take_along_axis(cdf, sym[:, None], axis=1)[:, 0].astype(jnp.uint64)
    hi = jnp.take_along_axis(cdf, sym[:, None] + 1, axis=1)[:, 0].astype(jnp.uint64)
    f = hi - lo
    x_new = f * (x >> _u64(prob_bits)) + slot.astype(jnp.uint64) - lo
    refill = active & (x_new < _u64(RANS_L))
    lane = jnp.arange(x.shape[0])
    w = words[lane, jnp.minimum(pos, words.shape[1] - 1)].astype(jnp.uint64)
    x_new = jnp.where(refill, (x_new << _u64(32)) | w, x_new)
    pos = pos + refill.astype(jnp.int32)
    x = jnp.where(active, x_new, x)
    sym = jnp.where(active, sym, jnp.int32(0))
    return sym, RansDecState(x, words, pos)


_decode_step_jit = jax.jit(_decode_step, static_argnums=(2,))


@x64
def rans_decode_step(state: RansDecState, cdf, prob_bits: int, active=None):
    cdf = jnp.asarray(cdf, dtype=jnp.int32)
    if active is None:
        active = jnp.ones((cdf.shape[0],), dtype=bool)
    return _decode_step_jit(state, cdf, prob_bits, active)


def _decode_scan(words, cdfs, lengths, prob_bits):
    state = rans_decode_init.__wrapped__(words)
    wbuf = state.words  # read-only: scan constant, not a carry

    def step(carry, xs):
        x, pos = carry
        cdf_t, t = xs
        sym, st = _decode_step((x, wbuf, pos), cdf_t, prob_bits, t < lengths)
        return (st.x, st.pos), sym

    ts = jnp.arange(cdfs.shape[1], dtype=jnp.int32)
    _, syms = lax.scan(step, (state.x, state.pos), (jnp.swapaxes(cdfs, 0, 1), ts))
    return syms.T  # [B, T]


_decode_scan_jit = jax.jit(_decode_scan, static_argnums=(3,))


@x64
def rans_decode_scan(words, cdfs, lengths, prob_bits: int):
    """Pure-coder batched decode with precomputed per-step CDFs
    (``cdfs``: [B, T, V+1]) — for tests and static-model paths; the LM engine
    uses rans_decode_step inside its model loop instead."""
    words = jnp.asarray(words, dtype=jnp.uint32)
    cdfs = jnp.asarray(cdfs, dtype=jnp.int32)
    lengths = jnp.asarray(lengths, dtype=jnp.int32)
    return _decode_scan_jit(words, cdfs, lengths, prob_bits)
