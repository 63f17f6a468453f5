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
    lanes: int = 64,
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

    def finish(w0: int, nb: int, words_d, nwords_d) -> None:
        words, nwords = np.asarray(words_d), np.asarray(nwords_d)
        for j in range(nb):
            start = (w0 + j) * block_tokens
            length = min(block_tokens, n - start)
            payload = words[j, : nwords[j]].astype(">u4").tobytes()
            if len(payload) >= length and length > 0:
                blocks.append(BlockEntry(length, 0, data[start : start + length]))
            else:
                blocks.append(BlockEntry(length, length, payload))

    pending = None  # one-wave pipeline: fetch wave i while i+1 computes
    for w0 in range(0, nblocks, lanes):
        nb = min(lanes, nblocks - w0)
        tokens = np.zeros((lanes, block_tokens), dtype=np.int32)
        lengths = np.zeros((lanes,), dtype=np.int32)
        for j in range(nb):
            chunk = arr[(w0 + j) * block_tokens : (w0 + j + 1) * block_tokens]
            tokens[j, : len(chunk)] = chunk
            lengths[j] = len(chunk)
        words_d, nwords_d = lm_encode_windowed(
            cfg, params, tokens, lengths, prob_bits, overlap
        )
        if pending is not None:
            finish(*pending)
        pending = (w0, nb, words_d, nwords_d)
    if pending is not None:
        finish(*pending)
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
    nblocks = len(blocks)
    parts: list[bytes] = [b""] * nblocks

    def finish(w0: int, nb: int, syms_d) -> None:
        syms = None if syms_d is None else np.asarray(syms_d)
        for j in range(nb):
            blk = blocks[w0 + j]
            if blk.token_count == 0 and blk.raw_len > 0:
                parts[w0 + j] = blk.payload
            else:
                parts[w0 + j] = syms[j, : blk.token_count].astype(np.uint8).tobytes()

    pending = None
    for w0 in range(0, nblocks, lanes):
        nb = min(lanes, nblocks - w0)
        words = np.zeros((lanes, cap), dtype=np.uint32)
        lengths = np.zeros((lanes,), dtype=np.int32)
        any_coded = False
        for j in range(nb):
            blk = blocks[w0 + j]
            if blk.token_count == 0 and blk.raw_len > 0:
                continue
            w = np.frombuffer(blk.payload, dtype=">u4").astype(np.uint32)
            words[j, : len(w)] = w
            lengths[j] = blk.token_count
            any_coded = True
        syms_d = None
        if any_coded:
            syms_d = lm_decode_windowed(
                cfg, params, words, lengths, header.prob_bits, block_tokens, overlap
            )
        if pending is not None:
            finish(*pending)
        pending = (w0, nb, syms_d)
    if pending is not None:
        finish(*pending)
    out = bytearray()
    for p in parts:
        out += p
    if len(out) != header.original_len:
        raise ValueError("decoded length mismatch")
    return bytes(out)
