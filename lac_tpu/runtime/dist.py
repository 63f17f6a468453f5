"""Distributed (multi-host) compress/decompress on top of the turbo path.

Every process codes its contiguous span of blocks on its local devices;
payloads are allgathered in block order; the container is identical on
every host (and identical to the single-process container — bitstreams are
host-count-invariant, SURVEY.md §7 hard part #6).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.pallas_rans import (
    o0c_encode_fused,
    o0c_rans32_decode,
    o0n_decode_fits,
    o0n_encode_fused,
    o0n_rans32_decode,
    o1n_decode_fits,
    o1n_encode_fused,
    o1n_rans32_decode,
    o2n_decode_fits,
    o2n_encode_fused,
    o2n_rans32_decode,
)
from ..parallel.distributed import allgather_blocks, my_block_span
from ..stream.container import (
    CODEC_RANS32,
    CODEC_RANS64,
    BlockEntry,
    ContainerHeader,
    read_container,
    write_container,
)

__all__ = [
    "compress_distributed",
    "decompress_distributed",
    "lm_compress_distributed",
    "lm_decompress_distributed",
]

_PB = 16
_RETRIES = 2


def _with_retry(fn, what: str):
    """Failure-recovery for device work (SURVEY.md §5): blocks are
    independent, so a failed span is simply re-encoded/re-decoded; transient
    device/tunnel errors retry with fresh dispatches before surfacing."""
    last = None
    for attempt in range(_RETRIES + 1):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 - re-raised after retries
            last = e
    raise RuntimeError(f"{what} failed after {_RETRIES + 1} attempts") from last


def _encode_span(arr: np.ndarray, start: int, end: int, block_size: int, rate: int,
                 model: str = "order0n"):
    """Encode blocks [start, end) of the byte array; returns payload list."""
    n = len(arr)
    nblk = end - start
    if nblk <= 0:
        return []
    syms = np.zeros((block_size, nblk), dtype=np.int32)
    lengths = np.zeros((nblk,), dtype=np.int32)
    for j in range(nblk):
        chunk = arr[(start + j) * block_size : (start + j + 1) * block_size]
        syms[: len(chunk), j] = chunk
        lengths[j] = len(chunk)
    # cap matches turbo_compress: raw fallback (checked on nwords before
    # slicing) makes lanes needing more than block_size//2 words immaterial
    if model == "order0n":
        words, nwords = o0n_encode_fused(
            jnp.asarray(syms), jnp.asarray(lengths)[None, :], rate,
            block_size // 2 + 3,
        )
    elif model == "order1n":
        words, nwords = o1n_encode_fused(
            jnp.asarray(syms), jnp.asarray(lengths)[None, :], rate,
            block_size // 2 + 3,
        )
    elif model == "order2n":
        words, nwords = o2n_encode_fused(
            jnp.asarray(syms), jnp.asarray(lengths)[None, :], rate,
            block_size // 2 + 3,
        )
    else:
        words, nwords = o0c_encode_fused(
            jnp.asarray(syms), jnp.asarray(lengths)[None, :], 256, _PB, rate,
            block_size // 2 + 3,
        )
    words, nwords = np.asarray(words), np.asarray(nwords)
    out = []
    for j in range(nblk):
        raw = syms[: lengths[j], j].astype(np.uint8).tobytes()
        if 2 * int(nwords[j]) >= len(raw) and len(raw) > 0:
            out.append((int(lengths[j]), 0, raw))
        else:
            payload = words[j, : nwords[j]].astype(np.uint16).astype(">u2").tobytes()
            out.append((int(lengths[j]), int(lengths[j]), payload))
    return out


def compress_distributed(
    data: bytes, block_size: int = 1024, rate: int = 4, model: str = "order0n"
) -> bytes:
    """All processes call this with the same data; returns the container
    (identical on every process)."""
    if model not in ("order0c", "order0n", "order1n", "order2n"):
        raise ValueError(
            "dist model must be order0c, order0n, order1n, or order2n"
        )
    from .turbo import _decode_cap_bucket

    _fits = {"order0n": o0n_decode_fits, "order1n": o1n_decode_fits,
             "order2n": o2n_decode_fits}
    if model in _fits and not _fits[model](
        _decode_cap_bucket(block_size // 2 + 3, block_size), 1 << 30
    ):
        model = "order0c"  # geometry fallback, same rule as turbo_compress
    arr = np.frombuffer(data, dtype=np.uint8)
    nblocks = max(1, -(-len(data) // block_size))
    start, end = my_block_span(nblocks)
    mine = _with_retry(
        lambda: _encode_span(arr, start, end, block_size, rate, model),
        f"encode span [{start},{end})",
    )
    # serialize (raw_len, token_count, payload) triplets for the gather
    packed = [
        raw_len.to_bytes(4, "little") + tc.to_bytes(4, "little") + pl
        for raw_len, tc, pl in mine
    ]
    gathered = allgather_blocks(packed, nblocks)
    blocks = []
    for buf in gathered:
        raw_len = int.from_bytes(buf[:4], "little")
        tc = int.from_bytes(buf[4:8], "little")
        blocks.append(BlockEntry(raw_len, tc, buf[8:]))
    header = ContainerHeader(
        codec=CODEC_RANS32,
        prob_bits=_PB,
        model_id=model,
        config={"block_size": block_size, "rate": rate},
        original_len=len(data),
    )
    return write_container(header, blocks)


def lm_compress_distributed(
    data: bytes,
    model_ref: str = "prng:tiny:0",
    block_tokens: int = 512,
    lanes: int = 64,
    prob_bits: int = 16,
    overlap: int = 2,
    max_seq: int | None = None,
    model=None,
    mesh=None,
    det8: bool = False,
    kv8: bool = False,
    w8: bool = False,
    cache_grow: int | None = None,
    window_mode: str = "reprime",
    slide_seg: int | None = None,
) -> bytes:
    """Multi-process LM compression (BASELINE configs #4/#5): every process
    codes its contiguous span of blocks with its local devices (optionally a
    local (data, model) mesh — weights replicated or TP-sharded), payloads
    are allgathered in block order, and the container is identical on every
    process AND identical to the single-process container: a block's
    bitstream depends on (weights, schedule, wave shape), not on which
    process coded it (see lm_api.encode_lm_span)."""
    from ..models.lm_registry import resolve_lm
    from .lm_api import (
        _cfg_for_det8,
        _mesh_geometry,
        _prepare_mesh,
        auto_prob_bits,
        encode_lm_span,
    )
    from .lm_engine import GROW_BUCKET, lm_fingerprint

    if cache_grow is None:
        cache_grow = GROW_BUCKET
    cfg, params = model if model is not None else resolve_lm(model_ref, max_seq)
    cfg = _cfg_for_det8(cfg, det8, kv8=kv8, w8=w8)
    from .lm_api import _resolve_slide_seg, _resolve_window_mode

    window_mode = _resolve_window_mode(window_mode, cfg)
    slide_seg = _resolve_slide_seg(slide_seg, window_mode, cfg, block_tokens)
    if cfg.vocab < 256:
        raise ValueError("byte-level coding needs vocab >= 256")
    prob_bits = auto_prob_bits(cfg, prob_bits)
    params, place = _prepare_mesh(mesh, cfg, params, lanes)
    fingerprint = lm_fingerprint(cfg, params, prob_bits, cache_grow, slide_seg)
    n = len(data)
    nblocks = max(1, -(-n // block_tokens))
    start, end = my_block_span(nblocks)
    mine = _with_retry(
        lambda: encode_lm_span(
            cfg, params, place, data, start, end, block_tokens, lanes,
            prob_bits, overlap, cache_grow=cache_grow, window_mode=window_mode,
            slide_seg=slide_seg,
        ),
        f"lm encode span [{start},{end})",
    )
    packed = [
        raw_len.to_bytes(4, "little") + tc.to_bytes(4, "little") + pl
        for raw_len, tc, pl in mine
    ]
    gathered = allgather_blocks(packed, nblocks)
    blocks = []
    for buf in gathered:
        raw_len = int.from_bytes(buf[:4], "little")
        tc = int.from_bytes(buf[4:8], "little")
        blocks.append(BlockEntry(raw_len, tc, buf[8:]))
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
            "mesh": _mesh_geometry(mesh),
            "det8": bool(cfg.det8),
            "kv8": bool(cfg.kv8),
            "w8": bool(cfg.w8),
            "cache_grow": int(cache_grow),
            "window_mode": window_mode,
            "slide_seg": int(slide_seg),
        },
        original_len=n,
    )
    return write_container(header, blocks)


def lm_decompress_distributed(container: bytes, model=None, mesh=None) -> bytes:
    """Each process decodes its block span with the LM engine; output bytes
    are allgathered in order (identical result on every process). The
    container's recorded encode-mesh geometry is reconstructed per process
    exactly as in lm_api.lm_decompress_bytes (skipped for det8 containers,
    whose bitstreams are topology-invariant — any local mesh works)."""
    from ..models.lm_registry import resolve_lm
    from .lm_api import (
        _cfg_for_det8,
        _prepare_mesh,
        _reconstruct_mesh,
        decode_lm_span,
    )
    from .lm_engine import lm_fingerprint

    header, blocks = read_container(container)
    if header.model_id != "lm" or header.codec != CODEC_RANS64:
        raise ValueError("not an LM container")
    c = header.config
    cfg, params = model if model is not None else resolve_lm(c["model_ref"], c["max_seq"])
    cfg = _cfg_for_det8(cfg, bool(c.get("det8")), decoding=True,
                        kv8=bool(c.get("kv8")), w8=bool(c.get("w8")))
    if not c.get("det8"):
        mesh = _reconstruct_mesh(c.get("mesh"), mesh)
    params, place = _prepare_mesh(mesh, cfg, params, c["lanes"])
    fp = lm_fingerprint(cfg, params, header.prob_bits,
                        int(c.get("cache_grow", 0)), int(c.get("slide_seg", 0)))
    if fp != c["fingerprint"]:
        raise ValueError(
            "model fingerprint mismatch: decoder weights/stack differ from the "
            f"encoder's (got {fp}, container has {c['fingerprint']})"
        )
    nblocks = len(blocks)
    start, end = my_block_span(nblocks)
    outs = _with_retry(
        lambda: decode_lm_span(
            cfg, params, place, blocks, start, end, c["block_tokens"],
            c["lanes"], header.prob_bits, c["overlap"],
            cache_grow=int(c.get("cache_grow", 0)),
            window_mode=c.get("window_mode", "reprime"),
            slide_seg=int(c.get("slide_seg", 0)),
        ),
        f"lm decode span [{start},{end})",
    )
    gathered = allgather_blocks(outs, nblocks)
    out = b"".join(gathered)
    if len(out) != header.original_len:
        raise ValueError("decoded length mismatch")
    return out


def decompress_distributed(container: bytes) -> bytes:
    """Each process decodes its span; output bytes are allgathered in order
    (identical result on every process)."""
    header, blocks = read_container(container)
    block_size = header.config["block_size"]
    rate = header.config["rate"]
    nblocks = len(blocks)
    start, end = my_block_span(nblocks)
    outs: list[bytes] = []
    span = blocks[start:end]
    coded = [b for b in span if not (b.token_count == 0 and b.raw_len > 0)]
    if coded:
        from .turbo import _decode_cap_bucket

        # size the grid to the span's longest coded payload (raw fallback
        # bounds coded payloads below block_size//2+3 words) — the fixed
        # block_size+2 grid used to blow the nibble kernels' VMEM gate
        cap = _decode_cap_bucket(max(len(b.payload) for b in coded) // 2, block_size)
        words = np.zeros((len(coded), cap), dtype=np.uint32)
        lengths = np.zeros((len(coded),), dtype=np.int32)
        for j, blk in enumerate(coded):
            w = np.frombuffer(blk.payload, dtype=">u2").astype(np.uint32)
            words[j, : len(w)] = w
            lengths[j] = blk.token_count
        if header.model_id in ("order0n", "order1n", "order2n"):
            fn = {"order0n": o0n_rans32_decode, "order1n": o1n_rans32_decode,
                  "order2n": o2n_rans32_decode}[header.model_id]
            dec = lambda: np.asarray(
                fn(jnp.asarray(words), jnp.asarray(lengths), block_size, rate)
            )
        else:
            dec = lambda: np.asarray(
                o0c_rans32_decode(
                    jnp.asarray(words), jnp.asarray(lengths), block_size, 256,
                    _PB, rate,
                )
            )
        syms = _with_retry(dec, f"decode span [{start},{end})")
    ci = 0
    for blk in span:
        if blk.token_count == 0 and blk.raw_len > 0:
            outs.append(blk.payload)
        else:
            outs.append(syms[: blk.token_count, ci].astype(np.uint8).tobytes())
            ci += 1
    gathered = allgather_blocks(outs, nblocks)
    out = b"".join(gathered)
    if len(out) != header.original_len:
        raise ValueError("decoded length mismatch")
    return out
