"""Deterministic integer CDF construction and rescaling.

This module is the single principled mechanism replacing the reference's
three independent quantization guards (SURVEY.md §2.4):

1. pre-quantization additive bias   (reference arithmetic_coding.py:63-72)
2. rescale-time flooring            (reference arith_code.py:83-93)
3. fixed-point clip at model output (reference llama_compress.py:29)

Two invariants every function here preserves:

- **codability**: every symbol's quantized width is >= 1, so the entropy
  coder can always represent it;
- **exact totals**: a quantized distribution sums exactly to its stated
  total, so encoder and decoder partition the interval identically.

The host (NumPy) and device (jax.numpy) implementations are written with the
same operation order. Cross-path bit-equality of the *float* stage is not
assumed anywhere (XLA and libm exp() may differ); what matters is that a
given path is self-consistent between its own encode and decode, which holds
because both run the identical computation (SURVEY.md §2.5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "rescale_cdf",
    "quantize_logits_np",
    "cdf_from_freq_np",
    "quantize_logits",
    "cdf_from_freq",
    "gather_intervals",
]


def rescale_cdf(cdf, denom: int):
    """Rescale an integer CDF (cumulative counts, total ``cdf[-1]``) so its
    total becomes exactly ``denom``, with every symbol width >= 1.

    Proportional flooring with a remaining-symbols budget: symbol ``i``'s
    cumulative value is clamped into ``[p+1, denom - (n-1-i))]`` so that no
    later symbol can be starved. Requires ``denom >= len(cdf)``.

    This is the capability of the reference's ``fudged_dist``
    (arith_code.py:83-93) as a standalone pure function; the arithmetic
    coder applies it with ``denom`` = live interval width, and the rANS path
    never needs it because quantized totals are powers of two matching the
    coder precision (the reference's own observation at arith_code.py:41-43
    that power-of-two denominators avoid recalculation).
    """
    n = len(cdf)
    total = cdf[-1]
    if denom < n:
        raise ValueError(f"denom {denom} < alphabet size {n}: not codable")
    if total == denom:
        return cdf
    out = [0] * n
    p = 0
    for i in range(n):
        c = (cdf[i] * denom) // total
        hi = denom - (n - 1 - i)
        c = p + 1 if c <= p else (hi if c > hi else c)
        out[i] = c
        p = c
    return out


def quantize_logits_np(logits: np.ndarray, prob_bits: int, det: bool = False) -> np.ndarray:
    """Quantize float logits ``[..., V]`` to integer frequencies ``[..., V]``
    summing exactly to ``2**prob_bits`` with every frequency >= 1.

    Method: stable softmax in float32, scale to ``total - V`` (reserving the
    +1 floor for every symbol), floor to int, then assign the rounding
    residual to the argmax symbol — deterministic given identical logits.

    ``det=True`` mirrors the jnp det path (``detmath.det_exp_np`` + integer
    denominator) op for op; tests cross-check the two bit-for-bit on CPU,
    giving the det8 frequency construction a host-side spec holder like the
    byte codecs have."""
    v = logits.shape[-1]
    total = 1 << prob_bits
    if total < 2 * v:
        raise ValueError(f"prob_bits {prob_bits} too small for vocab {v}")
    x = logits.astype(np.float32)
    x = x - x.max(axis=-1, keepdims=True)
    budget = np.float32(total - v)
    if det:
        from .detmath import ceil_log2, det_exp_np

        p = det_exp_np(x)
        sb = 30 - ceil_log2(v)
        pi = np.round(p * np.float32(2.0**sb)).astype(np.int32)
        tot = pi.sum(axis=-1, keepdims=True, dtype=np.int64)
        scale = (budget * np.float32(2.0**sb)) / tot.astype(np.float32)
    else:
        p = np.exp(x)
        scale = budget / p.sum(axis=-1, keepdims=True, dtype=np.float32)
    q = np.floor(p * scale).astype(np.int64)
    freq = q + 1
    residual = total - freq.sum(axis=-1, keepdims=True)
    amax = np.argmax(freq, axis=-1)
    np.put_along_axis(
        freq, amax[..., None], np.take_along_axis(freq, amax[..., None], -1) + residual, -1
    )
    return freq


def cdf_from_freq_np(freq: np.ndarray) -> np.ndarray:
    """Exclusive-prefix CDF with a trailing total: shape ``[..., V+1]``,
    ``cdf[..., 0] = 0``, ``cdf[..., -1] = total``. Integer, hence
    deterministic on any backend."""
    c = np.cumsum(freq, axis=-1)
    zero = np.zeros_like(c[..., :1])
    return np.concatenate([zero, c], axis=-1)


# --------------------------------------------------------------------------
# Device (jax.numpy) implementations. Same operation order as the NumPy
# versions; self-consistent between encode and decode because both run the
# identical jitted computation on identical logits (SURVEY.md §2.5).
# --------------------------------------------------------------------------


def quantize_logits(logits: jax.Array, prob_bits: int, det: bool = False) -> jax.Array:
    """jnp mirror of quantize_logits_np: logits [..., V] -> int32 frequencies
    summing exactly to 2**prob_bits, each >= 1. prob_bits <= 30 so the total
    fits int32.

    ``det=True`` (the transformer's det8 mode) replaces the float softmax
    denominator — the one order-sensitive reduction here — with the shared
    integer-denominator rule (``detmath.int_sum_pow2``, the same helper the
    det8 attention softmax uses): integer addition is associative, so the
    resulting frequencies cannot depend on how a mesh tiles the vocab
    reduction. All other steps are elementwise float or integer already."""
    v = logits.shape[-1]
    total = 1 << prob_bits
    if total < 2 * v or prob_bits > 30:
        raise ValueError(f"prob_bits {prob_bits} unusable for vocab {v}")
    x = logits.astype(jnp.float32)
    x = x - jnp.max(x, axis=-1, keepdims=True)
    budget = jnp.float32(total - v)
    if det:
        from .detmath import det_exp, int_sum_pow2

        p = det_exp(x)
        _, tot, sb = int_sum_pow2(p)
        scale = budget * jnp.float32(2.0**sb) / tot.astype(jnp.float32)
    else:
        p = jnp.exp(x)
        scale = budget / jnp.sum(p, axis=-1, keepdims=True)
    q = jnp.floor(p * scale).astype(jnp.int32)
    freq = q + 1
    residual = total - jnp.sum(freq, axis=-1, keepdims=True)
    amax = jnp.argmax(freq, axis=-1, keepdims=True)
    bump = jnp.take_along_axis(freq, amax, -1) + residual
    ar = jnp.arange(v, dtype=amax.dtype)
    freq = jnp.where(ar == amax, bump, freq)
    return freq


_CDF_CHUNK = 4096


def _cdf_chunk() -> int:
    import os

    return int(os.environ.get("LAC_CDF_CHUNK", _CDF_CHUNK))


def _cumsum_blocked(f: jax.Array, chunk: int | None = None) -> jax.Array:
    """Inclusive int32 cumsum along the last axis, blocked two-level:
    within-chunk scans + a chunk-offset scan. Integer addition is
    associative, so the values are bit-identical to the flat scan at every
    blocking — this exists purely to bound COMPILE cost: one flat
    associative_scan over a 128k-wide non-pow2 vocab (Llama-3's 128256 at
    [32, V]) is a depth-17 slice/pad/add graph that wedges the remote
    compiler for tens of minutes (measurements/r4_llama8b_b32_bisect.log,
    the round-3 B=32 wedge r3_llama8b_b32.log), while the blocked form
    compiles in seconds."""
    if chunk is None:
        chunk = _cdf_chunk()
    v = f.shape[-1]
    if chunk <= 0 or v <= chunk:  # chunk<=0 = flat scan (the A/B debug knob)
        return jax.lax.associative_scan(jnp.add, f, axis=-1)
    pad = (-v) % chunk
    if pad:
        f = jnp.pad(f, [(0, 0)] * (f.ndim - 1) + [(0, pad)])
    nc = f.shape[-1] // chunk
    f = f.reshape(f.shape[:-1] + (nc, chunk))
    within = jax.lax.associative_scan(jnp.add, f, axis=-1)
    totals = within[..., -1]
    offsets = jax.lax.associative_scan(jnp.add, totals, axis=-1) - totals
    out = within + offsets[..., None]
    return out.reshape(out.shape[:-2] + (nc * chunk,))[..., :v]


def cdf_from_freq(freq: jax.Array) -> jax.Array:
    """jnp mirror of cdf_from_freq_np (int32 exclusive-prefix CDF).
    associative_scan instead of jnp.cumsum: XLA's reduce-window cumsum
    allocates O(V) VMEM scratch that trips the 16MB scoped limit on TPU.
    Wide vocabs run the blocked form (identical integers, bounded compile
    cost — _cumsum_blocked)."""
    c = _cumsum_blocked(freq.astype(jnp.int32))
    zero = jnp.zeros_like(c[..., :1])
    return jnp.concatenate([zero, c], axis=-1)


def gather_intervals(cdf: jax.Array, syms: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-position coding intervals of known symbols (the encode side's
    model->coder handoff): cdf [..., V+1], syms [...] int -> (cdf_lo, freq)."""
    lo = jnp.take_along_axis(cdf, syms[..., None], axis=-1)[..., 0]
    hi = jnp.take_along_axis(cdf, syms[..., None] + 1, axis=-1)[..., 0]
    return lo, hi - lo
