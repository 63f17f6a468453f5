"""LM coding engine: lock-step batched encode/decode with a transformer
predictor (the flagship path; reference llama_compress.py capability).

Determinism contract (SURVEY.md §2.5): encoder and decoder run the SAME
jitted step computation on the SAME shapes and the SAME schedule — one
single-token forward per position, lock-step across B lanes. Given identical
weights/framework/hardware, the float logits are identical on both sides, so
the integer CDFs match bit-for-bit. The container carries a model fingerprint
so a decoder on a different stack fails loudly instead of emitting garbage.

Throughput model: decode is token-serial per stream (SURVEY.md §3.2), so all
throughput comes from lane batching — B streams per step amortize the weight
reads (HBM-bound, like LLM serving decode). The reference codes ONE stream
per model forward; this engine codes B.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..coder.vector import (RansDecState, _decode_step, _encode_scan,
                            rans_decode_init)
from ..models.transformer import LMConfig, ensure_w8, forward, init_cache
from ..ops.quantize import cdf_from_freq, gather_intervals, quantize_logits
from ..utils.jaxutil import x64

__all__ = [
    "lm_encode",
    "lm_decode",
    "lm_fingerprint",
    "lm_encode_windowed",
    "lm_decode_windowed",
    "window_schedule",
]


def _step_cdf(cfg: LMConfig, params, cache, prev, prob_bits: int):
    """One lock-step model step: prev tokens [B] -> (cdf [B, V+1], cache)."""
    logits, cache = forward(cfg, params, prev[:, None], cache)
    freq = quantize_logits(logits[:, 0, :], prob_bits, det=cfg.det8)
    return cdf_from_freq(freq), cache


@functools.partial(jax.jit, static_argnums=(0, 4, 5))
def _encode_intervals(cfg: LMConfig, params, tokens, lengths, prob_bits: int,
                      window: int | None = None):
    """Forward pass over all positions collecting the coded symbols'
    (cdf_lo, freq). tokens [B, T] int32. ``window`` overrides the cache
    width (slide mode rings a cfg.max_seq cache under arbitrary T)."""
    b = tokens.shape[0]
    # cache sized to the block (rounded up for layout): every step reads the
    # whole cache, so this is directly attention HBM traffic
    cache = init_cache(cfg, b, window or -(-tokens.shape[1] // 128) * 128)
    prev0 = jnp.full((b,), cfg.bos_id, dtype=jnp.int32)

    def step(carry, tok_t):
        cache, prev = carry
        cdf, cache = _step_cdf(cfg, params, cache, prev, prob_bits)
        lo, f = gather_intervals(cdf, tok_t)
        return (cache, tok_t), (lo.astype(jnp.int32), f.astype(jnp.int32))

    (_, _), (lo, f) = lax.scan(step, (cache, prev0), tokens.T)
    return lo.T, f.T


# --------------------------------------------------------------------------
# Chunked det8 encode: the serial stepping above exists because decode is
# inherently token-serial and the FLOAT forward's bits depend on the XLA
# schedule, so encode must replay decode's exact graph (module docstring).
# The det8 forward removes that constraint: every order-sensitive reduction
# is int32 (associative) and every quantization scale is row-local, so an
# s-token chunk through the cache-route attention produces bit-identical
# logits to s serial steps at the same positions (transformer._det_softmax
# cap / _det_attn_out_cached). Encode therefore runs CHUNK tokens per
# forward — MXU-batched like a prefill — while decode steps serially, and
# the CDFs still match bit for bit. Chunk size bounds the [B, H, C, W+C]
# score/probs intermediates; override with LAC_DET_ENCODE_CHUNK.
# --------------------------------------------------------------------------

_DET_ENCODE_CHUNK = 128


def _det_chunk() -> int:
    import os

    return int(os.environ.get("LAC_DET_ENCODE_CHUNK", _DET_ENCODE_CHUNK))


@functools.partial(jax.jit, static_argnums=(0, 5))
def _chunk_intervals(cfg: LMConfig, params, cache, prev, tokens_seg, prob_bits: int):
    """One chunked encode step: feed [prev | tokens_seg[:-1]] through the
    cache-route forward, collect every position's (cdf_lo, freq) at once."""
    inp = jnp.concatenate([prev[:, None], tokens_seg[:, :-1]], axis=1)
    logits, cache = forward(cfg, params, inp, cache)
    freq = quantize_logits(logits, prob_bits, det=True)
    lo, f = gather_intervals(cdf_from_freq(freq), tokens_seg)
    return cache, tokens_seg[:, -1], lo.astype(jnp.int32), f.astype(jnp.int32)


def _seg_intervals_chunked(cfg: LMConfig, params, cache, prev, seg_toks, prob_bits: int,
                           ring: int = 0):
    """Drive _chunk_intervals over a segment in fixed-size chunks (python
    loop over static shapes: one compile per (chunk, tail) shape).

    ``ring``: cache width under slide mode — chunks additionally split at
    ring boundaries so a chunk's cache write never wraps mid-DUS (the chunk
    layout is a pure function of (steps, chunk, ring): schedule =
    bitstream)."""
    steps = seg_toks.shape[1]
    chunk = min(_det_chunk(), steps)
    los, fs = [], []
    i = 0
    while i < steps:
        n = min(chunk, steps - i)
        if ring:
            n = min(n, ring - (i % ring))
        sub = seg_toks[:, i : i + n]
        cache, prev, lo, f = _chunk_intervals(cfg, params, cache, prev, sub, prob_bits)
        los.append(lo)
        fs.append(f)
        i += n
    return cache, prev, jnp.concatenate(los, axis=1), jnp.concatenate(fs, axis=1)


def _encode_intervals_det(cfg: LMConfig, params, tokens, prob_bits: int):
    """det8 single-window interval collection (chunked; same cache width and
    therefore the same softmax cap as _decode_scan's serial graph)."""
    b = tokens.shape[0]
    cache = init_cache(cfg, b, -(-tokens.shape[1] // 128) * 128)
    prev0 = jnp.full((b,), cfg.bos_id, dtype=jnp.int32)
    _, _, lo, f = _seg_intervals_chunked(cfg, params, cache, prev0, tokens, prob_bits)
    return lo, f


def _encode_intervals_det_slide(scfg: LMConfig, params, tokens, prob_bits: int):
    """det8 slide-mode interval collection: one W-wide ring cache, chunks
    split at ring boundaries (scfg must carry slide=True and rope_positions
    sized to the block — _slide_cfg)."""
    b = tokens.shape[0]
    cache = init_cache(scfg, b)  # width = max_seq: the ring
    prev0 = jnp.full((b,), scfg.bos_id, dtype=jnp.int32)
    _, _, lo, f = _seg_intervals_chunked(
        scfg, params, cache, prev0, tokens, prob_bits, ring=scfg.max_seq)
    return lo, f


# --------------------------------------------------------------------------
# Growing-cache schedule (``cache_grow`` = bucket size, 0 = legacy).
#
# Serial attention reads the WHOLE fixed-width cache every step (masked
# loads still move the bytes), which is the measured per-step HBM floor at
# coding shapes: B=256, W=256, byte-12l is ~1.2GB of bf16 K/V per step.
# Early steps only need the prefix, so the schedule starts the cache at one
# ``bucket`` of width and re-allocates +bucket at bucket boundaries (one
# device copy each; total copy bytes ~= one full cache, amortized across
# T steps). Average width over a T-step block falls from T_pad to about
# (T_pad + bucket)/2 — a ~1.4-1.9x cut in attention traffic.
#
# The schedule is a pure function of (t_len, bucket), so encoder and
# decoder replay identical computations; the bucket is recorded in the
# container config (``cache_grow``) and absent/0 means the legacy
# fixed-width graph — old containers decode unchanged. Works for both the
# float serial path and the det8 chunked path (widths per segment derive
# from the same schedule; the det8 softmax cap 2*W follows the segment's
# cache width on both sides).
# --------------------------------------------------------------------------

GROW_BUCKET = 128


@functools.partial(jax.jit, static_argnums=(0, 2))
def _grow_cache(cfg: LMConfig, cache, new_w: int):
    b = cache["k"].shape[1]
    nk = init_cache(cfg, b, new_w)
    z = jnp.zeros((), jnp.int32)
    # copy every buffer key (k/v, plus ks/vs under kv8) into the wider cache
    return {
        key: (val if key == "pos" else jax.lax.dynamic_update_slice(
            nk[key], val, (z,) * val.ndim))
        for key, val in cache.items()
    }


def _check_grow(cache_grow: int) -> None:
    if cache_grow < 0:
        raise ValueError(f"cache_grow must be >= 0, got {cache_grow}")


def _grown_segments(t_len: int, bucket: int):
    """[(start, steps, width)] covering [0, t_len) in bucket strides.
    bucket=0 means no growth: one segment at width None (= current cache)."""
    if not bucket:
        return [(0, t_len, None)]
    segs = []
    for i in range(0, t_len, bucket):
        steps = min(bucket, t_len - i)
        segs.append((i, steps, -(-(i + steps) // bucket) * bucket))
    return segs


def _run_grown(cfg: LMConfig, cache, carry, t_len: int, bucket: int, step):
    """Drive the growing-cache schedule: grow the cache to each segment's
    width, then ``step(cache, carry, i, steps) -> (cache, carry)``.

    This is the ONE owner of the grow-loop geometry for all four engine
    paths (encode/decode x plain/windowed) — the schedule IS the bitstream,
    so encoder/decoder copies that could drift are a corruption hazard, not
    a style issue."""
    for i, steps, w in _grown_segments(t_len, bucket):
        if w is not None and cache["k"].shape[2] < w:
            cache = _grow_cache(cfg, cache, w)
        cache, carry = step(cache, carry, i, steps)
    return cache, carry


def _seg_intervals_any(cfg: LMConfig, params, cache, prev, seg, prob_bits: int):
    """One segment of interval collection — chunked under det8 (bit-identical
    to serial there), serial scan otherwise."""
    if cfg.det8:
        return _seg_intervals_chunked(cfg, params, cache, prev, seg, prob_bits)
    return _seg_intervals(cfg, params, cache, prev, seg, prob_bits, seg.shape[1])


def _encode_intervals_grown(cfg: LMConfig, params, tokens, prob_bits: int, bucket: int):
    b, t = tokens.shape
    los, fs = [], []

    def step(cache, prev, i, steps):
        cache, prev, lo, f = _seg_intervals_any(
            cfg, params, cache, prev, tokens[:, i : i + steps], prob_bits)
        los.append(lo)
        fs.append(f)
        return cache, prev

    cache = init_cache(cfg, b, bucket)
    prev = jnp.full((b,), cfg.bos_id, dtype=jnp.int32)
    _run_grown(cfg, cache, prev, t, bucket, step)
    return jnp.concatenate(los, axis=1), jnp.concatenate(fs, axis=1)


def _decode_scan_grown(cfg: LMConfig, params, words, lengths, prob_bits: int, t_len: int, bucket: int):
    b = words.shape[0]
    outs = []

    def step(cache, carry, i, steps):
        prev, rstate = carry
        cache, prev, rstate, syms = _seg_decode(
            cfg, params, cache, prev, rstate, prob_bits, steps, jnp.int32(i), lengths
        )
        outs.append(syms)
        return cache, (prev, rstate)

    cache = init_cache(cfg, b, bucket)
    prev = jnp.full((b,), cfg.bos_id, dtype=jnp.int32)
    rstate = rans_decode_init.__wrapped__(words)
    _run_grown(cfg, cache, (prev, rstate), t_len, bucket, step)
    return jnp.concatenate(outs, axis=1)


@functools.partial(jax.jit, static_argnums=(0, 4, 5, 6))
def _decode_scan(cfg: LMConfig, params, words, lengths, prob_bits: int, t_len: int,
                 window: int | None = None):
    b = words.shape[0]
    cache = init_cache(cfg, b, window or -(-t_len // 128) * 128)
    prev0 = jnp.full((b,), cfg.bos_id, dtype=jnp.int32)
    rstate = rans_decode_init.__wrapped__(words)

    # the word buffer ([B, ~T/2] u32 at large blocks) is read-only: keep it a
    # scan CONSTANT (closed over), not a carry — only (x, pos) thread through
    def step(carry, t):
        cache, prev, x, pos = carry
        cdf, cache = _step_cdf(cfg, params, cache, prev, prob_bits)
        sym, st = _decode_step((x, rstate.words, pos), cdf, prob_bits, t < lengths)
        return (cache, sym, st.x, st.pos), sym

    ts = jnp.arange(t_len, dtype=jnp.int32)
    _, syms = lax.scan(step, (cache, prev0, rstate.x, rstate.pos), ts)
    return syms.T


_encode_rans = jax.jit(_encode_scan, static_argnums=(3, 4))


@x64
def lm_encode(cfg: LMConfig, params, tokens: np.ndarray, lengths: np.ndarray,
              prob_bits: int, cache_grow: int = 0):
    """Encode B lanes of tokens ([B, T], T <= cfg.max_seq; model state resets
    per lane/block). Returns (words [B, T+2] u32 decode-order, nwords [B]).
    ``cache_grow``: bucketed growing-cache schedule (0 = legacy fixed width;
    must match the decoder's value — the container records it)."""
    _check_grow(cache_grow)
    params = ensure_w8(cfg, params)
    if tokens.shape[1] > cfg.max_seq:
        raise ValueError(f"block tokens {tokens.shape[1]} > context {cfg.max_seq}")
    tokens = jnp.asarray(tokens, dtype=jnp.int32)
    lengths = jnp.asarray(lengths, dtype=jnp.int32)
    if cache_grow:
        lo, f = _encode_intervals_grown(cfg, params, tokens, prob_bits, cache_grow)
    elif cfg.det8:
        lo, f = _encode_intervals_det(cfg, params, tokens, prob_bits)
    else:
        lo, f = _encode_intervals(cfg, params, tokens, lengths, prob_bits)
    return _encode_rans(lo, f, lengths, prob_bits, tokens.shape[1] + 2)


@x64
def lm_decode(cfg: LMConfig, params, words: np.ndarray, lengths: np.ndarray,
              prob_bits: int, t_len: int, cache_grow: int = 0):
    _check_grow(cache_grow)
    params = ensure_w8(cfg, params)
    if t_len > cfg.max_seq:
        raise ValueError(f"block tokens {t_len} > context {cfg.max_seq}")
    words = jnp.asarray(words, dtype=jnp.uint32)
    lengths = jnp.asarray(lengths, dtype=jnp.int32)
    if cache_grow:
        return _decode_scan_grown(cfg, params, words, lengths, prob_bits, t_len, cache_grow)
    return _decode_scan(cfg, params, words, lengths, prob_bits, t_len)


# --------------------------------------------------------------------------
# Sliding-window mode: blocks longer than the model context.
#
# Deterministic re-prime policy with the reference's semantics
# (llama_compress.py:31-39): when the KV cache fills, keep the most recent
# ``window - window//overlap`` tokens, rebuild the cache by prefilling them
# (positions re-based to 0..keep-1), and continue stepping. The schedule
# depends only on (t_len, window, overlap), so encoder and decoder replay
# the identical sequence of fixed-shape computations — the same-schedule
# determinism contract extended across re-primes. The re-prime prefill's
# last-position logits code the next token (no step is wasted).
# --------------------------------------------------------------------------


def window_schedule(t_len: int, window: int, overlap: int = 2):
    """Segments of the windowed run: [(t0, steps, reprime_before)]."""
    keep = window - window // overlap
    if keep < 1 or keep >= window:
        raise ValueError(f"bad window/overlap: {window}/{overlap}")
    segs = []
    pos = 0
    first = True
    while pos < t_len:
        if first:
            steps = min(window, t_len - pos)
            segs.append((pos, steps, False))
            first = False
        else:
            # re-prime codes 1 token; then step the rest of the refilled room
            steps = min(window - keep, t_len - pos)
            segs.append((pos, steps, True))
        pos += steps
    return segs, keep


@functools.partial(jax.jit, static_argnums=(0, 5, 6))
def _seg_intervals(cfg: LMConfig, params, cache, prev, tokens_seg, prob_bits: int, steps: int):
    """Scan `steps` single-token steps; tokens_seg [B, steps]."""

    def step(carry, tok_t):
        cache, prev = carry
        cdf, cache = _step_cdf(cfg, params, cache, prev, prob_bits)
        lo, f = gather_intervals(cdf, tok_t)
        return (cache, tok_t), (lo.astype(jnp.int32), f.astype(jnp.int32))

    (cache, prev), (lo, f) = lax.scan(step, (cache, prev), tokens_seg.T)
    return cache, prev, lo.T, f.T


@functools.partial(jax.jit, static_argnums=(0, 3))
def _reprime_cdf(cfg: LMConfig, params, kept_tokens, prob_bits: int):
    """Fresh cache, prefill kept tokens, return (cdf for the next token,
    cache)."""
    b = kept_tokens.shape[0]
    cache = init_cache(cfg, b)
    logits, cache = forward(cfg, params, kept_tokens, cache, prefill=True)
    freq = quantize_logits(logits[:, -1, :], prob_bits, det=cfg.det8)
    return cdf_from_freq(freq), cache


def _slide_cfg(cfg: LMConfig, t_len: int = 0) -> LMConfig:
    """Coding-time upgrade to the ring-buffer forward (LMConfig.slide);
    raises for learned-position models via LMConfig.__post_init__.
    ``t_len`` sizes det8's host RoPE tables (global positions reach the
    block length under slide; the float path ignores it)."""
    import dataclasses

    return dataclasses.replace(
        cfg, slide=True, rope_positions=t_len if cfg.det8 else 0)


@x64
def lm_encode_windowed(
    cfg: LMConfig, params, tokens: np.ndarray, lengths: np.ndarray,
    prob_bits: int, overlap: int = 2, cache_grow: int = 0,
    mode: str = "reprime", slide_seg: int = 0,
):
    """Encode lanes of arbitrary length past the model context.

    ``mode``: "reprime" rebuilds the cache from the kept suffix every
    window/overlap tokens (reference llama_compress.py:31-39 semantics);
    "slide" rings a fixed cfg.max_seq cache with global RoPE positions —
    no re-prime prefills, full-window context at every token (LMConfig.slide
    docstring). The mode is part of the bitstream schedule: the container
    records it and the decoder must replay the same one. Slide ignores
    cache_grow (the ring is fixed-width; growth would only cover the first
    window).

    ``slide_seg``: float slide-mode segment length — both sides run the
    serial steps in ≤slide_seg-step scan programs instead of one t_len-long
    scan (schedule = bitstream: the container records it; 0 = the legacy
    single-scan graphs). det8 ignores it (its bits are schedule-invariant;
    its decode is always segmented at _SLIDE_SEG)."""
    _check_grow(cache_grow)
    params = ensure_w8(cfg, params)
    tokens = jnp.asarray(tokens, dtype=jnp.int32)
    lengths = jnp.asarray(lengths, dtype=jnp.int32)
    b, t_len = tokens.shape
    if t_len <= cfg.max_seq:
        if cache_grow:
            lo, f = _encode_intervals_grown(cfg, params, tokens, prob_bits, cache_grow)
        elif cfg.det8:
            lo, f = _encode_intervals_det(cfg, params, tokens, prob_bits)
        else:
            lo, f = _encode_intervals(cfg, params, tokens, lengths, prob_bits)
        return _encode_rans(lo, f, lengths, prob_bits, t_len + 2)
    if mode == "slide":
        scfg = _slide_cfg(cfg, t_len)
        if cfg.det8:
            # chunked det8 encode over the ring: bit-identical to the serial
            # decode (ring-age mask + ring-aligned chunks, transformer
            # _attention; same int32 reductions and softmax cap both sides)
            lo, f = _encode_intervals_det_slide(scfg, params, tokens, prob_bits)
        elif slide_seg:
            lo, f = _encode_intervals_slide_seg(scfg, params, tokens,
                                                prob_bits, slide_seg)
        else:
            lo, f = _encode_intervals(scfg, params, tokens, lengths, prob_bits,
                                      window=cfg.max_seq)
        return _encode_rans(lo, f, lengths, prob_bits, t_len + 2)
    if mode != "reprime":
        raise ValueError(f"unknown window mode: {mode!r}")
    segs, keep = window_schedule(t_len, cfg.max_seq, overlap)
    # growth applies to the FIRST window only (re-primes prefill `keep`
    # tokens, so later segments need the full width anyway); it requires
    # window % bucket == 0 so the grown width lands exactly on the window
    grow = cache_grow if (cache_grow and cfg.max_seq % cache_grow == 0) else 0
    cache = init_cache(cfg, b, grow if grow else None)
    prev = jnp.full((b,), cfg.bos_id, dtype=jnp.int32)
    los, fs = [], []
    for t0, steps, reprime in segs:
        if reprime:
            kept = lax.dynamic_slice(tokens, (0, t0 - keep), (b, keep))
            cdf, cache = _reprime_cdf(cfg, params, kept, prob_bits)
            tok0 = tokens[:, t0]
            lo0, f0 = gather_intervals(cdf, tok0)
            los.append(lo0.astype(jnp.int32)[:, None])
            fs.append(f0.astype(jnp.int32)[:, None])
            prev = tok0
            t0, steps = t0 + 1, steps - 1
            if steps == 0:
                continue
        def enc_step(cache, prev, i, st, _t0=t0):
            seg_toks = lax.dynamic_slice(tokens, (0, _t0 + i), (b, st))
            cache, prev, lo, f = _seg_intervals_any(
                cfg, params, cache, prev, seg_toks, prob_bits)
            los.append(lo)
            fs.append(f)
            return cache, prev
        cache, prev = _run_grown(
            cfg, cache, prev, steps, grow if t0 == 0 else 0, enc_step)
    lo = jnp.concatenate(los, axis=1)
    f = jnp.concatenate(fs, axis=1)
    return _encode_rans(lo, f, lengths, prob_bits, t_len + 2)


# Slide decode segment length: two shapes max per run (seg + tail).
# 512 matches the segment scale the reprime det8 path runs without faulting.
_SLIDE_SEG = 512


def _decode_scan_slide_seg(scfg: LMConfig, params, words, lengths,
                           prob_bits: int, t_len: int, seg: int = _SLIDE_SEG):
    """Serial slide-mode decode in bounded-scan segments.

    Two users share this schedule:
    - det8: bit-identical to one t_len-long scan by shape invariance; the
      single long scan reproducibly crashed the TPU worker
      (measurements/r3_slide_det8*.log), segments run clean.
    - float with a container-recorded ``slide_seg``: float logits are only
      guaranteed reproducible within ONE compiled schedule, so the encoder
      runs the SAME ≤seg-step segment geometry (_encode_intervals_slide_seg)
      — the same pairing the reprime mode already relies on (_seg_intervals /
      _seg_decode segments on both sides). Bounded programs also avoid the
      worker crash the single 16384-step scan hits at wide lanes
      (r3_lm_corpus10_slide_b16k.log), unlocking lanes ≥128 at the flagship
      block."""
    b = words.shape[0]
    cache = init_cache(scfg, b)  # width = max_seq: the ring
    prev = jnp.full((b,), scfg.bos_id, dtype=jnp.int32)
    rstate = rans_decode_init.__wrapped__(words)
    outs = []
    i = 0
    while i < t_len:
        n = min(seg, t_len - i)
        cache, prev, rstate, syms = _seg_decode(
            scfg, params, cache, prev, rstate, prob_bits, n, jnp.int32(i),
            lengths)
        outs.append(syms)
        i += n
    return jnp.concatenate(outs, axis=1)


def _encode_intervals_slide_seg(scfg: LMConfig, params, tokens, prob_bits: int,
                                seg: int):
    """Float slide-mode interval collection in bounded-scan segments: the
    encode side of _decode_scan_slide_seg's schedule. Serial single-token
    steps over the max_seq ring (the ring write wraps per step, so segment
    boundaries need no ring alignment — unlike det8's multi-token chunks)."""
    b, t_len = tokens.shape
    cache = init_cache(scfg, b)  # width = max_seq: the ring
    prev = jnp.full((b,), scfg.bos_id, dtype=jnp.int32)
    los, fs = [], []
    i = 0
    while i < t_len:
        n = min(seg, t_len - i)
        cache, prev, lo, f = _seg_intervals(
            scfg, params, cache, prev, tokens[:, i : i + n], prob_bits, n)
        los.append(lo)
        fs.append(f)
        i += n
    return jnp.concatenate(los, axis=1), jnp.concatenate(fs, axis=1)


@functools.partial(jax.jit, static_argnums=(0, 5, 6))
def _seg_decode(cfg: LMConfig, params, cache, prev, rstate, prob_bits: int, steps: int, t0, lengths):
    # words stays a scan constant (see _decode_scan); only (x, pos) carry
    words = rstate.words

    def step(carry, i):
        cache, prev, x, pos = carry
        cdf, cache = _step_cdf(cfg, params, cache, prev, prob_bits)
        sym, st = _decode_step((x, words, pos), cdf, prob_bits, (t0 + i) < lengths)
        return (cache, sym, st.x, st.pos), sym

    (cache, prev, x, pos), syms = lax.scan(
        step, (cache, prev, rstate.x, rstate.pos), jnp.arange(steps, dtype=jnp.int32)
    )
    return cache, prev, RansDecState(x, words, pos), syms.T


@x64
def lm_decode_windowed(
    cfg: LMConfig, params, words: np.ndarray, lengths: np.ndarray,
    prob_bits: int, t_len: int, overlap: int = 2, cache_grow: int = 0,
    mode: str = "reprime", slide_seg: int = 0,
):
    _check_grow(cache_grow)
    params = ensure_w8(cfg, params)
    words = jnp.asarray(words, dtype=jnp.uint32)
    lengths = jnp.asarray(lengths, dtype=jnp.int32)
    if t_len <= cfg.max_seq:
        if cache_grow:
            return _decode_scan_grown(cfg, params, words, lengths, prob_bits,
                                      t_len, cache_grow)
        return _decode_scan(cfg, params, words, lengths, prob_bits, t_len)
    if mode == "slide":
        scfg = _slide_cfg(cfg, t_len)
        if cfg.det8:
            # segmented serial decode: bit-identical to one t_len-long scan
            # (det8 steps are shape/schedule-invariant — the same property
            # behind chunked encode), but each executable scans <= _SLIDE_SEG
            # steps. The single long scan det8+slide program reproducibly
            # crashes the TPU worker ("kernel fault";
            # measurements/r3_slide_det8*.log) while the same step function
            # in bounded segments (reprime windowed det8) does not — this
            # routes around the faulting program shape without touching the
            # bitstream.
            return _decode_scan_slide_seg(scfg, params, words, lengths,
                                          prob_bits, t_len)
        if slide_seg:
            # float segmented schedule: replay the container's slide_seg
            # geometry (the encode side ran _encode_intervals_slide_seg)
            return _decode_scan_slide_seg(scfg, params, words, lengths,
                                          prob_bits, t_len, slide_seg)
        return _decode_scan(scfg, params, words, lengths, prob_bits, t_len,
                            window=cfg.max_seq)
    if mode != "reprime":
        raise ValueError(f"unknown window mode: {mode!r}")
    b = words.shape[0]
    segs, keep = window_schedule(t_len, cfg.max_seq, overlap)
    grow = cache_grow if (cache_grow and cfg.max_seq % cache_grow == 0) else 0
    cache = init_cache(cfg, b, grow if grow else None)
    prev = jnp.full((b,), cfg.bos_id, dtype=jnp.int32)
    rstate = rans_decode_init.__wrapped__(words)
    out = jnp.zeros((b, 0), dtype=jnp.int32)
    for t0, steps, reprime in segs:
        if reprime:
            kept = lax.dynamic_slice(out, (0, t0 - keep), (b, keep))
            cdf, cache = _reprime_cdf(cfg, params, kept, prob_bits)
            sym, rstate = _decode_step_jit(
                rstate, cdf, prob_bits, jnp.full((b,), t0, jnp.int32) < lengths
            )
            out = jnp.concatenate([out, sym[:, None]], axis=1)
            prev = sym
            t0, steps = t0 + 1, steps - 1
            if steps == 0:
                continue
        def dec_step(cache, carry, i, st, _t0=t0):
            prev, rstate, out = carry
            cache, prev, rstate, syms = _seg_decode(
                cfg, params, cache, prev, rstate, prob_bits, st,
                jnp.int32(_t0 + i), lengths
            )
            return cache, (prev, rstate, jnp.concatenate([out, syms], axis=1))
        cache, (prev, rstate, out) = _run_grown(
            cfg, cache, (prev, rstate, out), steps, grow if t0 == 0 else 0,
            dec_step)
    return out


_decode_step_jit = jax.jit(_decode_step, static_argnums=(2,))


@x64
def lm_fingerprint(cfg: LMConfig, params, prob_bits: int, cache_grow: int = 0,
                   slide_seg: int = 0) -> int:
    """Determinism fingerprint stored in the container: crc of the quantized
    CDF of a fixed probe (BOS-primed first step, batch 1). A decoder whose
    stack would produce different CDFs fails this check up front instead of
    decoding garbage (SURVEY.md §2.5 hard part #1).

    ``cache_grow`` folds the growing-cache schedule into the crc: the
    schedule changes the float path's bits (reduction widths differ), and a
    decoder that does not understand the key would otherwise sail past the
    version/fingerprint gates and mis-decode silently. cache_grow=0 keeps
    the legacy value so old containers still validate."""
    import zlib

    params = ensure_w8(cfg, params)
    cache = init_cache(cfg, 1)
    prev = jnp.full((1,), cfg.bos_id, dtype=jnp.int32)
    cdf, _ = jax.jit(_step_cdf, static_argnums=(0, 4))(cfg, params, cache, prev, prob_bits)
    crc = zlib.crc32(np.asarray(cdf).tobytes())
    if cache_grow:
        crc = zlib.crc32(f"cache_grow={cache_grow}".encode(), crc)
    if slide_seg:
        # the float slide segment geometry changes the compiled schedule and
        # therefore the float bits; fold it so a decoder that predates the
        # key fails loudly instead of mis-decoding (same rationale as
        # cache_grow). 0 keeps every older container's value unchanged.
        crc = zlib.crc32(f"slide_seg={slide_seg}".encode(), crc)
    if cfg.w8:
        # the probe CDF already reflects w8 projections; fold the mode tag
        # anyway so the failure message stays attributable (same as kv8).
        # "v2" = the hazard-#5 barrier-pinned dequant chain (round 4): the
        # probe is one batch-1 step and only PROBABILISTICALLY separates the
        # old and new dequant groupings — the explicit version tag makes
        # pre-change w8 containers fail the gate deterministically.
        crc = zlib.crc32(b"w8v2", crc)
    if cfg.kv8:
        # kv8 only alters the CACHE route, which the one-step empty-cache
        # probe never exercises — fold the mode in explicitly so a float
        # decoder fails loudly on a kv8 container (and vice versa).
        # "v2" = the round-5 barrier-pinned cache-dequant chains (the
        # hazard-#5 treatment applied to kv8): the probe cannot see cache-
        # route bit changes, so the version tag must carry them.
        crc = zlib.crc32(b"kv8v2", crc)
    return crc
