"""LM compression file API: bytes -> .lac container with an LM predictor.

The flagship path (reference llama_compress.py capability, file-level):
bytes are the token alphabet (V=256 byte-level LM by default — no tokenizer
coupling, losslessness by construction), split into fixed token-count
blocks, coded in lock-step waves of exactly ``lanes`` streams (wave shape is
part of the determinism contract and travels in the container), with
sliding-window re-priming when blocks exceed the model context.

Container config schema (codec 1 / model_id "lm"):
    model_ref, max_seq, block_tokens, lanes, overlap, fingerprint
"""

from __future__ import annotations

import numpy as np

from ..coder.rans import encode_capacity
from ..models.lm_registry import resolve_lm
from ..stream.container import (
    CODEC_RANS64,
    BlockEntry,
    ContainerHeader,
    read_container,
    write_container,
)
from .lm_engine import lm_decode_windowed, lm_encode_windowed, lm_fingerprint

__all__ = ["lm_compress_bytes", "lm_decompress_bytes"]


def lm_compress_bytes(
    data: bytes,
    model_ref: str = "prng:tiny:0",
    block_tokens: int = 512,
    lanes: int = 16,
    prob_bits: int = 16,
    overlap: int = 2,
    max_seq: int | None = None,
    model=None,
) -> bytes:
    """model: optional pre-resolved (cfg, params) to skip re-resolution."""
    cfg, params = model if model is not None else resolve_lm(model_ref, max_seq)
    if cfg.vocab < 256:
        raise ValueError("byte-level coding needs vocab >= 256")
    # quantization needs 2**pb >= 2*vocab (every symbol >=1 count with half
    # the budget left for the distribution); auto-raise for large vocabs
    # (e.g. GPT-2's 50257 -> 17). Travels in the header, so decode follows.
    while (1 << prob_bits) < 2 * cfg.vocab:
        prob_bits += 1
    arr = np.frombuffer(data, dtype=np.uint8)
    n = len(arr)
    nblocks = max(1, -(-n // block_tokens))
    fingerprint = lm_fingerprint(cfg, params, prob_bits)
    blocks: list[BlockEntry] = []
    for w0 in range(0, nblocks, lanes):
        nb = min(lanes, nblocks - w0)
        tokens = np.zeros((lanes, block_tokens), dtype=np.int32)
        lengths = np.zeros((lanes,), dtype=np.int32)
        for j in range(nb):
            chunk = arr[(w0 + j) * block_tokens : (w0 + j + 1) * block_tokens]
            tokens[j, : len(chunk)] = chunk
            lengths[j] = len(chunk)
        words, nwords = lm_encode_windowed(
            cfg, params, tokens, lengths, prob_bits, overlap
        )
        words, nwords = np.asarray(words), np.asarray(nwords)
        for j in range(nb):
            payload = words[j, : nwords[j]].astype(">u4").tobytes()
            raw = tokens[j, : lengths[j]].astype(np.uint8).tobytes()
            if len(payload) >= len(raw) and len(raw) > 0:
                blocks.append(BlockEntry(int(lengths[j]), 0, raw))
            else:
                blocks.append(BlockEntry(int(lengths[j]), int(lengths[j]), payload))
    header = ContainerHeader(
        codec=CODEC_RANS64,
        prob_bits=prob_bits,
        model_id="lm",
        config={
            "model_ref": model_ref,
            "max_seq": cfg.max_seq,
            "block_tokens": block_tokens,
            "lanes": lanes,
            "overlap": overlap,
            "fingerprint": fingerprint,
        },
        original_len=n,
    )
    return write_container(header, blocks)


def lm_decompress_bytes(container: bytes, model=None) -> bytes:
    header, blocks = read_container(container)
    if header.model_id != "lm" or header.codec != CODEC_RANS64:
        raise ValueError("not an LM container")
    c = header.config
    cfg, params = model if model is not None else resolve_lm(c["model_ref"], c["max_seq"])
    fp = lm_fingerprint(cfg, params, header.prob_bits)
    if fp != c["fingerprint"]:
        raise ValueError(
            "model fingerprint mismatch: decoder weights/stack differ from the "
            f"encoder's (got {fp}, container has {c['fingerprint']})"
        )
    block_tokens, lanes, overlap = c["block_tokens"], c["lanes"], c["overlap"]
    cap = encode_capacity(block_tokens)
    out = bytearray()
    nblocks = len(blocks)
    for w0 in range(0, nblocks, lanes):
        nb = min(lanes, nblocks - w0)
        words = np.zeros((lanes, cap), dtype=np.uint32)
        lengths = np.zeros((lanes,), dtype=np.int32)
        for j in range(nb):
            blk = blocks[w0 + j]
            if blk.token_count == 0 and blk.raw_len > 0:
                continue
            w = np.frombuffer(blk.payload, dtype=">u4").astype(np.uint32)
            words[j, : len(w)] = w
            lengths[j] = blk.token_count
        syms = np.asarray(
            lm_decode_windowed(
                cfg, params, words, lengths, header.prob_bits, block_tokens, overlap
            )
        )
        for j in range(nb):
            blk = blocks[w0 + j]
            if blk.token_count == 0 and blk.raw_len > 0:
                out += blk.payload
            else:
                out += syms[j, : blk.token_count].astype(np.uint8).tobytes()
    if len(out) != header.original_len:
        raise ValueError("decoded length mismatch")
    return bytes(out)
