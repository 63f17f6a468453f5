"""Batched block engine: file bytes -> blocks -> lock-step coded lanes.

The reference codes ONE stream token-serially (SURVEY.md §3); decode is
inherently token-serial per stream (each symbol's CDF depends on the decoded
prefix), so all throughput here comes from **lane batching**: the file is
split into independent fixed-size blocks, every block is a coder lane, and
one ``lax.scan`` steps all lanes together — model CDF, rANS state update,
word emission — entirely on device. Model state resets per block, which is
also the recovery/parallelism unit (container framing).

Role: correctness oracle / CI path. These XLA-scan codecs run ALL blocks as
one lane set with a T-step scan — at the documented per-step dispatch
overhead (ops/pallas_rans.py) they are orders of magnitude slower than the
fused-Pallas turbo engine (runtime/turbo.py), which is the production byte
path. Use them to cross-check the coder spec (tests do, bit-for-bit) and on
hosts without the Pallas kernels, not for throughput.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..coder.rans import encode_capacity
from ..coder.vector import _decode_step, _encode_scan, rans_decode_init
from ..models.functional import ScanModel
from ..models.registry import get_scan_model, model_config
from ..ops.quantize import gather_intervals
from ..stream.container import (
    CODEC_RANS32,
    CODEC_RANS64,
    BlockEntry,
    ContainerHeader,
    read_container,
    write_container,
)
from ..utils.jaxutil import x64

__all__ = [
    "compress_bytes",
    "decompress_bytes",
    "decompress_blocks",
    "encode_lanes",
    "decode_lanes",
]


@functools.partial(jax.jit, static_argnums=(2,))
def _model_intervals(syms, lengths, model: ScanModel):
    """Forward pass over all lanes: per-position (cdf_lo, freq) of the known
    symbols. syms [B, T] int32 -> (cdf_lo [B, T] i32, freq [B, T] i32)."""
    b, t_len = syms.shape

    def step(state, sym_t):
        cdf = model.cdf(state)
        lo, f = gather_intervals(cdf, sym_t)
        state = model.update(state, sym_t)
        return state, (lo.astype(jnp.int32), f.astype(jnp.int32))

    state0 = model.init_state(b)
    _, (lo, f) = lax.scan(step, state0, syms.T)
    return lo.T, f.T


@functools.partial(jax.jit, static_argnums=(2, 3))
def _decode_lanes(words, lengths, model: ScanModel, t_len: int):
    """Lock-step batched decode: model cdf -> rANS step -> model update."""
    rstate = rans_decode_init.__wrapped__(words)
    state0 = model.init_state(words.shape[0])

    def step(carry, t):
        state, rstate = carry
        cdf = model.cdf(state)
        sym, rstate = _decode_step(rstate, cdf, model.prob_bits, t < lengths)
        state = model.update(state, sym)
        return (state, rstate), sym

    ts = jnp.arange(t_len, dtype=jnp.int32)
    _, syms = lax.scan(step, (state0, rstate), ts)
    return syms.T  # [B, T]


@x64
def encode_lanes(syms: np.ndarray, lengths: np.ndarray, model: ScanModel):
    """syms [B, T] -> (words [B, T+2] u32 decode-order, nwords [B])."""
    syms = jnp.asarray(syms, dtype=jnp.int32)
    lengths = jnp.asarray(lengths, dtype=jnp.int32)
    lo, f = _model_intervals(syms, lengths, model)
    cap = syms.shape[1] + 2
    return _encode_scan_jit(lo, f, lengths, model.prob_bits, cap)


_encode_scan_jit = jax.jit(_encode_scan, static_argnums=(3, 4))


@x64
def decode_lanes(words: np.ndarray, lengths: np.ndarray, model: ScanModel, t_len: int):
    words = jnp.asarray(words, dtype=jnp.uint32)
    lengths = jnp.asarray(lengths, dtype=jnp.int32)
    return _decode_lanes(words, lengths, model, t_len)


# --------------------------------------------------------------------------
# File-level API
# --------------------------------------------------------------------------


def _blockify(data: bytes, block_size: int) -> tuple[np.ndarray, np.ndarray]:
    n = len(data)
    b = max(1, -(-n // block_size))
    syms = np.zeros((b, block_size), dtype=np.int32)
    lengths = np.zeros((b,), dtype=np.int32)
    arr = np.frombuffer(data, dtype=np.uint8)
    for i in range(b):
        chunk = arr[i * block_size : (i + 1) * block_size]
        syms[i, : len(chunk)] = chunk
        lengths[i] = len(chunk)
    return syms, lengths


def compress_bytes(
    data: bytes,
    model_id: str = "order0",
    block_size: int = 1 << 16,
    prob_bits: int = 16,
    **model_kw,
) -> bytes:
    """Compress raw bytes into a .lac container (byte-alphabet models).
    model_ids "order0c"/"order0n" route to the fused-Pallas turbo path
    (codec 2; order0n is the nibble-factorized fast default)."""
    if model_id in ("order0c", "order0n", "order1n", "order2n"):
        from .turbo import turbo_compress

        return turbo_compress(
            data, block_size=min(block_size, 1 << 12), model=model_id, **model_kw
        )
    model = get_scan_model(model_id, prob_bits=prob_bits, **model_kw)
    syms, lengths = _blockify(data, block_size)
    words, nwords = encode_lanes(syms, lengths, model)
    words, nwords = np.asarray(words), np.asarray(nwords)
    blocks = []
    for i in range(syms.shape[0]):
        payload = words[i, : nwords[i]].astype(">u4").tobytes()
        blocks.append(BlockEntry(int(lengths[i]), int(lengths[i]), payload))
    header = ContainerHeader(
        codec=CODEC_RANS64,
        prob_bits=prob_bits,
        model_id=model_id,
        config={"block_size": block_size, **model_config(model_id, **model_kw)},
        original_len=len(data),
    )
    return write_container(header, blocks)


def decompress_bytes(container: bytes) -> bytes:
    header, blocks = read_container(container)
    if header.codec == CODEC_RANS32:
        from .turbo import turbo_decompress

        return turbo_decompress(container)
    if header.codec != CODEC_RANS64:
        raise ValueError(f"unsupported codec {header.codec}")
    cfg = dict(header.config)
    block_size = cfg.pop("block_size")
    model = get_scan_model(header.model_id, prob_bits=header.prob_bits, **cfg)
    b = len(blocks)
    cap = encode_capacity(block_size)
    words = np.zeros((b, cap), dtype=np.uint32)
    lengths = np.zeros((b,), dtype=np.int32)
    for i, blk in enumerate(blocks):
        w = np.frombuffer(blk.payload, dtype=">u4").astype(np.uint32)
        words[i, : len(w)] = w
        lengths[i] = blk.token_count
    syms = np.asarray(decode_lanes(words, lengths, model, block_size))
    out = bytearray()
    for i, blk in enumerate(blocks):
        out += syms[i, : blk.token_count].astype(np.uint8).tobytes()
    if len(out) != header.original_len:
        raise ValueError("decoded length mismatch")
    return bytes(out)


def decompress_blocks(container: bytes, indices) -> list[bytes]:
    """Random-access decode of selected blocks (any codec). Blocks are
    independent streams, so this is also the resume/recovery primitive:
    re-decode exactly the blocks you need (e.g. the spans verify_container
    flagged, or a byte range's covering blocks)."""
    header, blocks = read_container(container)
    if header.codec == CODEC_RANS32:
        from .turbo import turbo_decompress_blocks

        return turbo_decompress_blocks(container, indices)
    if header.codec != CODEC_RANS64:
        raise ValueError(f"unsupported codec {header.codec}")
    cfg = dict(header.config)
    block_size = cfg.pop("block_size")
    model = get_scan_model(header.model_id, prob_bits=header.prob_bits, **cfg)
    sel = [blocks[i] for i in indices]
    cap = encode_capacity(block_size)
    words = np.zeros((len(sel), cap), dtype=np.uint32)
    lengths = np.zeros((len(sel),), dtype=np.int32)
    for i, blk in enumerate(sel):
        w = np.frombuffer(blk.payload, dtype=">u4").astype(np.uint32)
        words[i, : len(w)] = w
        lengths[i] = blk.token_count
    syms = np.asarray(decode_lanes(words, lengths, model, block_size))
    return [
        syms[i, : blk.token_count].astype(np.uint8).tobytes()
        for i, blk in enumerate(sel)
    ]
