"""rANS-64/32 entropy coder — NumPy host implementation and bitstream spec.

This is the production codec of the framework (the oracle arithmetic coder in
reference.py exists for parity and cross-checking). rANS is chosen over the
reference's carry-propagating arithmetic coder because it is the TPU-native
formulation of the same capability (reference arith_code.py:156-334):

- fixed-width u64 state, **no carries ever** (the reference needed bignum
  carry buffers: arithmetic_coding.py:180-208, arith_code.py:230-246);
- bounded work per symbol: at most ONE 32-bit word emitted per encode step
  and ONE word consumed per decode step (proof below) — so the batched
  per-lane step is branch-free under `jit`;
- decode state transition needs no interval renorm loop at all.

Spec (every implementation in this repo must match bit-for-bit):

- ``RANS_L = 2**31``; state invariant ``x ∈ [RANS_L, 2**63)``.
- Probabilities are integer frequencies ``freq[s] >= 1`` summing to
  ``2**prob_bits`` with ``prob_bits <= 31`` (so ``RANS_L % 2**prob_bits == 0``,
  the b-uniqueness condition), produced by ops/quantize.
- Encode visits message symbols in REVERSE order (rANS is LIFO). Per symbol:
  ``x_max = (RANS_L >> prob_bits) << 32) * freq``; if ``x >= x_max`` emit the
  low 32 bits and shift right 32 (at most once: after the shift
  ``x < 2**31 <= x_max`` since ``x_max >= 2**(63-prob_bits) >= 2**32``);
  then ``x = ((x // freq) << prob_bits) + (x % freq) + cdf_lo``.
- After all symbols, the final state is pushed as two words: low 32, high 32.
- The per-stream word sequence is stored in **decode order** (reverse of
  emission order): decoder reads ``high, low`` to seed ``x``, then one word
  whenever ``x < RANS_L`` after a symbol.
- Decode per symbol: ``slot = x & (2**prob_bits - 1)``; symbol is the unique
  ``s`` with ``cdf[s] <= slot < cdf[s+1]``;
  ``x = freq[s] * (x >> prob_bits) + slot - cdf[s]``; refill (at most once:
  one word makes ``x >= 2**32 > RANS_L``).

Worst-case words per stream: ``T + 2`` (one per symbol + final state).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "RANS_L",
    "rans_encode_np",
    "rans_decode_np",
    "encode_capacity",
    "RANS32_L",
    "rans32_encode_np",
    "rans32_decode_np",
]

RANS_L = 1 << 31
_MASK32 = (1 << 32) - 1

# rANS-32/16 variant (u32 state, 16-bit renorm words, prob_bits <= 16): the
# in-kernel codec for byte-alphabet models — Pallas/Mosaic vector lanes are
# 32-bit, so the u64 state of the primary codec doesn't fit there. Same
# construction, same proofs (<=1 word in/out per symbol for prob_bits<=16).
RANS32_L = 1 << 16
_MASK16 = (1 << 16) - 1


def encode_capacity(num_symbols: int) -> int:
    """Guaranteed-sufficient word capacity for a stream of ``num_symbols``."""
    return num_symbols + 2


def rans_encode_np(cdf_lo: np.ndarray, freq: np.ndarray, prob_bits: int) -> np.ndarray:
    """Encode one stream. ``cdf_lo[t]``/``freq[t]`` are the coded symbol's
    interval at position ``t`` (forward order). Returns uint32 words in
    decode order."""
    assert 1 <= prob_bits <= 31
    x = RANS_L
    words: list[int] = []
    for t in range(len(freq) - 1, -1, -1):
        f = int(freq[t])
        lo = int(cdf_lo[t])
        x_max = ((RANS_L >> prob_bits) << 32) * f
        if x >= x_max:
            words.append(x & _MASK32)
            x >>= 32
        x = ((x // f) << prob_bits) + (x % f) + lo
    words.append(x & _MASK32)
    words.append((x >> 32) & _MASK32)
    return np.array(words[::-1], dtype=np.uint32)


def rans32_encode_np(cdf_lo: np.ndarray, freq: np.ndarray, prob_bits: int) -> np.ndarray:
    """rANS-32/16 single-stream encode; returns uint16 words in decode order
    (first two words are the final state: high 16, low 16)."""
    assert 1 <= prob_bits <= 16
    x = RANS32_L
    words: list[int] = []
    for t in range(len(freq) - 1, -1, -1):
        f = int(freq[t])
        lo = int(cdf_lo[t])
        x_max = ((RANS32_L >> prob_bits) << 16) * f
        if x >= x_max:
            words.append(x & _MASK16)
            x >>= 16
        x = ((x // f) << prob_bits) + (x % f) + lo
    words.append(x & _MASK16)
    words.append((x >> 16) & _MASK16)
    return np.array(words[::-1], dtype=np.uint16)


def rans32_decode_np(
    words: np.ndarray, num_symbols: int, cdf_provider, prob_bits: int
) -> list[int]:
    """rANS-32/16 single-stream decode (mirror of rans_decode_np)."""
    assert 1 <= prob_bits <= 16
    mask = (1 << prob_bits) - 1
    x = (int(words[0]) << 16) | int(words[1])
    pos = 2
    out: list[int] = []
    for _t in range(num_symbols):
        cdf = cdf_provider(_t, out)
        slot = x & mask
        s = int(np.searchsorted(cdf, slot, side="right")) - 1
        f = int(cdf[s + 1]) - int(cdf[s])
        x = f * (x >> prob_bits) + slot - int(cdf[s])
        if x < RANS32_L:
            x = (x << 16) | int(words[pos])
            pos += 1
        out.append(s)
    return out


def rans_decode_np(
    words: np.ndarray, num_symbols: int, cdf_provider, prob_bits: int
) -> list[int]:
    """Decode one stream. ``cdf_provider(t)`` returns the step-``t``
    exclusive-prefix CDF (length V+1, total ``2**prob_bits``) — it may depend
    on previously decoded symbols (the engine feeds the model here)."""
    assert 1 <= prob_bits <= 31
    mask = (1 << prob_bits) - 1
    pos = 0
    x = (int(words[0]) << 32) | int(words[1])
    pos = 2
    out: list[int] = []
    for t in range(num_symbols):
        cdf = cdf_provider(t, out)
        slot = x & mask
        s = int(np.searchsorted(cdf, slot, side="right")) - 1
        f = int(cdf[s + 1]) - int(cdf[s])
        x = f * (x >> prob_bits) + slot - int(cdf[s])
        if x < RANS_L:
            x = (x << 32) | int(words[pos])
            pos += 1
        out.append(s)
    return out
