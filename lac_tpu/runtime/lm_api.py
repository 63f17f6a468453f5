"""LM compression file API: bytes -> .lac container with an LM predictor.

The flagship path (reference llama_compress.py capability, file-level):
bytes are the token alphabet (V=256 byte-level LM by default — no tokenizer
coupling, losslessness by construction), split into fixed token-count
blocks, coded in lock-step waves of exactly ``lanes`` streams (wave shape is
part of the determinism contract and travels in the container), with
sliding-window re-priming when blocks exceed the model context.

Container config schema (codec 1 / model_id "lm"):
    model_ref, max_seq, block_tokens, lanes, overlap, fingerprint, mesh, det8

Determinism and meshes (SURVEY.md §2.5): the byte path is pure-integer and
topology-invariant, but LM CDFs come from float32 logits, whose values can
depend on the device mesh (TP changes reduction layouts). The container
therefore records the encode mesh geometry; decode reconstructs that mesh
from local devices (failing early with a clear message if it cannot), and
the fingerprint still gates any residual stack mismatch loudly.

``det8=True`` removes the mesh dependence entirely: the forward runs in the
integer-reduction mode (models.transformer det8 — all order-sensitive
reductions in int32), so the bitstream is bit-identical at every mesh
geometry including none. The recorded mesh then becomes advisory and decode
may run on any topology (the fingerprint still certifies the stack).
"""

from __future__ import annotations

import jax
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
from .lm_engine import (GROW_BUCKET, _SLIDE_SEG, lm_decode_windowed,
                        lm_encode_windowed, lm_fingerprint)

__all__ = [
    "lm_compress_bytes",
    "lm_decompress_bytes",
    "lm_decompress_prefix",
    "lm_compress_tokens",
    "lm_decompress_tokens",
    "lm_compress_text",
    "lm_decompress_text",
    "encode_lm_span",
    "decode_lm_span",
    "auto_prob_bits",
]


def _mesh_geometry(mesh) -> dict | None:
    if mesh is None:
        return None
    return {"data": mesh.shape["data"], "model": mesh.shape["model"]}


def _prepare_mesh(mesh, cfg, params, lanes: int):
    """Shard params over the mesh and return a lane-placement function."""
    if mesh is None:
        return params, lambda toks, lens: (toks, lens)
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.shard import shard_params

    data = mesh.shape["data"]
    if lanes % data:
        raise ValueError(f"lanes ({lanes}) must divide by mesh data axis ({data})")
    params = shard_params(mesh, params)
    lane2 = NamedSharding(mesh, P("data", None))
    lane1 = NamedSharding(mesh, P("data"))

    def place(toks, lens):
        return jax.device_put(toks, lane2), jax.device_put(lens, lane1)

    return params, place


def _reconstruct_mesh(geom: dict | None, mesh=None):
    """Build (or validate) the decode mesh against the container's recorded
    encode geometry."""
    if geom is None:
        if mesh is not None:
            raise ValueError(
                "container was encoded without a mesh; decoding on a mesh is "
                "not bit-compatible (LM CDFs are mesh-dependent)"
            )
        return None
    if mesh is not None:
        have = _mesh_geometry(mesh)
        if have != geom:
            raise ValueError(f"decode mesh {have} != encode mesh {geom}")
        return mesh
    import jax

    from ..parallel.mesh import make_mesh

    need = geom["data"] * geom["model"]
    if len(jax.devices()) < need:
        raise ValueError(
            f"container was encoded on a {geom['data']}x{geom['model']} mesh; "
            f"only {len(jax.devices())} local devices available — decode on a "
            "host with at least that many devices (LM CDFs are mesh-dependent)"
        )
    return make_mesh(data=geom["data"], model=geom["model"],
                     devices=jax.devices()[:need])


def _cfg_for_det8(cfg, det8: bool, decoding: bool = False, kv8: bool = False,
                  w8: bool = False):
    """One owner for the forward-mode handshake (det8 / kv8 / w8): upgrade a
    float cfg when a mode is requested, and refuse a mode-resolved model for
    a container encoded without it at decode (the forward mode is part of
    the bitstream contract; without this check the mismatch would only
    surface as a generic fingerprint error)."""
    import dataclasses

    if det8 and (kv8 or w8):
        raise ValueError("det8 is mutually exclusive with kv8/w8 forward modes")
    for name, want in (("det8", det8), ("kv8", kv8), ("w8", w8)):
        have = getattr(cfg, name)
        if want and not have:
            cfg = dataclasses.replace(cfg, **{name: True})
        elif decoding and have and not want:
            raise ValueError(
                f"container was encoded WITHOUT {name} but the model was "
                f"resolved with {name}=True — the forward modes produce "
                f"different bitstreams; re-resolve the model without {name}"
            )
    return cfg


def _resolve_window_mode(window_mode: str, cfg) -> str:
    """Resolve "auto" to the best supported mode for this model: slide
    (measured better ratio AND wall at block 4096 on both flagship
    checkpoints, measurements/r3_slide.log, and at block 16384 for the float
    path, r3_slide_b16k.log) for rope models, reprime for learned-position
    models.

    History: det8 resolved to reprime for part of round 3 because the det8
    serial decode as ONE long scan reproducibly crashed the TPU worker
    (measurements/r3_slide_det8*.log). The decode now runs in bounded-scan
    segments (lm_engine._decode_scan_slide_seg — bit-identical by det8's
    shape invariance), proven clean on chip at block 4096
    (r3_slide_det8_seg.log) AND at the flagship block 16384
    (r4_slide_det8_b16k.log: byte-16l 0.8196 bpb lanes 16, bit-exact, no
    fault) — the round-3 block-size gate on auto routing is closed.
    Containers record the RESOLVED mode, never "auto"."""
    if window_mode != "auto":
        return window_mode
    if cfg.pos_embedding != "rope":
        return "reprime"
    return "slide"


def lm_compress_bytes(
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
    cache_grow: int = GROW_BUCKET,
    window_mode: str = "reprime",
    slide_seg: int | None = None,
) -> bytes:
    """model: optional pre-resolved (cfg, params) to skip re-resolution.
    mesh: optional jax.sharding.Mesh (axes ``data``, ``model``) — lanes
    shard over ``data``, weights TP-shard over ``model``; the geometry is
    recorded in the container and required again at decode (unless det8).
    det8: run the topology-invariant integer-reduction forward — the
    bitstream stops depending on the mesh, so decode may use any topology.
    cache_grow: KV-cache growth bucket (runtime.lm_engine) — the cache
    starts one bucket wide and grows per bucket, cutting serial attention
    traffic ~1.4-1.9x. Recorded in the container (schedule = bitstream);
    0 disables (legacy fixed-width graphs).
    window_mode: how blocks longer than the model context are coded —
    "reprime" (reference-style cache rebuilds every window/overlap tokens),
    "slide" (ring-buffer cache, no re-prime work, full-window context at
    every token; see lm_engine.lm_encode_windowed), or "auto" (slide for
    rope-position models — det8 included — else reprime; the
    RESOLVED mode is what the container records). Only meaningful when
    block_tokens > the model context. Slide measured better on both axes
    (ratio and wall) at both flagship scales: measurements/r3_slide.log.
    slide_seg: float slide-mode scan-segment length (None = the default
    _SLIDE_SEG for float slide, 0 = legacy single-scan graphs) — segmented
    programs avoid the TPU worker crash at wide lanes x flagship block
    (lm_engine._decode_scan_slide_seg docstring). Recorded in the container;
    det8 ignores it (schedule-invariant bits)."""
    cfg, params = model if model is not None else resolve_lm(model_ref, max_seq)
    cfg = _cfg_for_det8(cfg, det8, kv8=kv8, w8=w8)
    window_mode = _resolve_window_mode(window_mode, cfg)
    slide_seg = _resolve_slide_seg(slide_seg, window_mode, cfg, block_tokens)
    if cfg.vocab < 256:
        raise ValueError("byte-level coding needs vocab >= 256")
    prob_bits = auto_prob_bits(cfg, prob_bits)
    params, place = _prepare_mesh(mesh, cfg, params, lanes)
    n = len(data)
    nblocks = max(1, -(-n // block_tokens))
    # fingerprint computed with the coding placements so mesh-dependent
    # numerics are part of what it certifies
    fingerprint = lm_fingerprint(cfg, params, prob_bits, cache_grow, slide_seg)
    blocks = [
        BlockEntry(*t)
        for t in encode_lm_span(
            cfg, params, place, data, 0, nblocks, block_tokens, lanes,
            prob_bits, overlap, cache_grow=cache_grow, window_mode=window_mode,
            slide_seg=slide_seg,
        )
    ]
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


def _resolve_slide_seg(slide_seg: int | None, window_mode: str, cfg,
                       block_tokens: int) -> int:
    """Resolve the float slide segment length: the engine default when the
    float slide path will actually run windowed (segmented graphs are the
    crash-free wide-lane schedule), else 0. Explicit values pass through
    (0 forces the legacy single-scan graphs)."""
    if slide_seg is not None:
        return int(slide_seg)
    if window_mode == "slide" and not cfg.det8 and block_tokens > cfg.max_seq:
        return _SLIDE_SEG
    return 0


def _lm_decode_setup(header, model, mesh):
    """Shared decode-side setup (byte alphabet): resolve/validate the model,
    mesh, forward mode, and fingerprint against the container config."""
    c = header.config
    if header.model_id != "lm" or header.codec != CODEC_RANS64:
        raise ValueError("not an LM container")
    if c.get("alphabet", "bytes") != "bytes":
        raise ValueError(
            "container holds a token-alphabet stream; use lm_decompress_tokens"
        )
    cfg, params = model if model is not None else resolve_lm(c["model_ref"], c["max_seq"])
    cfg = _cfg_for_det8(cfg, bool(c.get("det8")), decoding=True,
                        kv8=bool(c.get("kv8")), w8=bool(c.get("w8")))
    if not c.get("det8"):
        # float CDFs are mesh-dependent: decode must replay the encode mesh
        mesh = _reconstruct_mesh(c.get("mesh"), mesh)
    params, place = _prepare_mesh(mesh, cfg, params, c["lanes"])
    fp = lm_fingerprint(cfg, params, header.prob_bits,
                        int(c.get("cache_grow", 0)), int(c.get("slide_seg", 0)))
    if fp != c["fingerprint"]:
        raise ValueError(
            "model fingerprint mismatch: decoder weights/stack differ from the "
            f"encoder's (got {fp}, container has {c['fingerprint']})"
        )
    return cfg, params, place


def lm_decompress_bytes(container: bytes, model=None, mesh=None) -> bytes:
    header, blocks = read_container(container)
    c = header.config
    cfg, params, place = _lm_decode_setup(header, model, mesh)
    parts = decode_lm_span(
        cfg, params, place, blocks, 0, len(blocks), c["block_tokens"],
        c["lanes"], header.prob_bits, c["overlap"],
        cache_grow=int(c.get("cache_grow", 0)),
        window_mode=c.get("window_mode", "reprime"),
        slide_seg=int(c.get("slide_seg", 0)),
    )
    out = bytearray()
    for p in parts:
        out += p
    if len(out) != header.original_len:
        raise ValueError("decoded length mismatch")
    return bytes(out)


def lm_decompress_prefix(container: bytes, model=None, mesh=None):
    """Recover the good PREFIX of a truncated or corrupt LM container.

    Parity with the reference's partial-decode debuggability —
    ``from_bin`` returns ``(sampler, exception, partial_output)`` on bad
    input (reference arithmetic_coding.py:331-336) — expressed in this
    framework's terms: blocks are independent streams with CRCs, so the
    recoverable unit is every intact block before the first damaged one.

    Returns ``(bytes, report)`` where report = {ok, recovered_blocks,
    total_blocks, bad_blocks, recovered_bytes, original_len}. Raises only
    when nothing is decodable (unparseable header, wrong model/fingerprint).
    """
    from ..stream.container import scan_container

    header, blocks, bad = scan_container(container)
    c = header.config
    cfg, params, place = _lm_decode_setup(header, model, mesh)
    ngood = bad[0] if bad else len(blocks)
    out = bytearray()
    if ngood:
        parts = decode_lm_span(
            cfg, params, place, blocks, 0, ngood, c["block_tokens"],
            c["lanes"], header.prob_bits, c["overlap"],
            cache_grow=int(c.get("cache_grow", 0)),
            window_mode=c.get("window_mode", "reprime"),
            slide_seg=int(c.get("slide_seg", 0)),
        )
        for p in parts:
            out += p
    report = {
        "ok": not bad and len(out) == header.original_len,
        "recovered_blocks": ngood,
        "total_blocks": len(blocks),
        "bad_blocks": bad,
        "recovered_bytes": len(out),
        "original_len": header.original_len,
    }
    return bytes(out), report


def _raw_dtype(vocab: int) -> np.dtype:
    """Minimal big-endian id width for the token alphabet's raw fallback."""
    if vocab <= 1 << 8:
        return np.dtype(">u1")
    if vocab <= 1 << 16:
        return np.dtype(">u2")
    return np.dtype(">u4")


def lm_compress_tokens(
    tokens,
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
    cache_grow: int = GROW_BUCKET,
    window_mode: str = "reprime",
    slide_seg: int | None = None,
) -> bytes:
    """Compress a 1-D sequence of model token ids (the reference's actual
    flagship interface — llama_compress.py codes the tokenizer's output
    stream, not raw bytes). Same engine, schedule, and container as
    lm_compress_bytes; the alphabet is the model vocabulary instead of
    bytes, and ``original_len`` counts tokens. Raw-fallback blocks store
    minimal-width big-endian ids, so incompressible spans cost
    ~ceil(log2(V)/8) bytes/token, never more."""
    cfg, params = model if model is not None else resolve_lm(model_ref, max_seq)
    cfg = _cfg_for_det8(cfg, det8, kv8=kv8, w8=w8)
    window_mode = _resolve_window_mode(window_mode, cfg)
    slide_seg = _resolve_slide_seg(slide_seg, window_mode, cfg, block_tokens)
    arr = np.ascontiguousarray(tokens, dtype=np.int32)
    if arr.ndim != 1:
        raise ValueError(f"tokens must be 1-D, got shape {arr.shape}")
    if arr.size and (arr.min() < 0 or arr.max() >= cfg.vocab):
        raise ValueError(
            f"token ids must be in [0, {cfg.vocab}); got "
            f"[{arr.min()}, {arr.max()}]"
        )
    prob_bits = auto_prob_bits(cfg, prob_bits)
    params, place = _prepare_mesh(mesh, cfg, params, lanes)
    n = arr.size
    nblocks = max(1, -(-n // block_tokens))
    fingerprint = lm_fingerprint(cfg, params, prob_bits, cache_grow, slide_seg)
    blocks = [
        BlockEntry(*t)
        for t in encode_lm_span(
            cfg, params, place, arr, 0, nblocks, block_tokens, lanes,
            prob_bits, overlap, cache_grow=cache_grow, window_mode=window_mode,
            slide_seg=slide_seg,
        )
    ]
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
            "alphabet": "tokens",
            "vocab": cfg.vocab,
            "cache_grow": int(cache_grow),
            "window_mode": window_mode,
            "slide_seg": int(slide_seg),
        },
        original_len=n,
    )
    return write_container(header, blocks)


def lm_decompress_tokens(container: bytes, model=None, mesh=None) -> np.ndarray:
    """Inverse of lm_compress_tokens: returns the int32 token id array."""
    header, blocks = read_container(container)
    if header.model_id != "lm" or header.codec != CODEC_RANS64:
        raise ValueError("not an LM container")
    c = header.config
    if c.get("alphabet", "bytes") != "tokens":
        raise ValueError(
            "container holds a byte-alphabet stream; use lm_decompress_bytes"
        )
    cfg, params = model if model is not None else resolve_lm(c["model_ref"], c["max_seq"])
    cfg = _cfg_for_det8(cfg, bool(c.get("det8")), decoding=True,
                        kv8=bool(c.get("kv8")), w8=bool(c.get("w8")))
    if cfg.vocab != c["vocab"]:
        raise ValueError(f"model vocab {cfg.vocab} != container vocab {c['vocab']}")
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
    rdt = _raw_dtype(cfg.vocab)
    parts = decode_lm_span(
        cfg, params, place, blocks, 0, len(blocks), c["block_tokens"],
        c["lanes"], header.prob_bits, c["overlap"], sym_dtype=rdt,
        cache_grow=int(c.get("cache_grow", 0)),
        window_mode=c.get("window_mode", "reprime"),
        slide_seg=int(c.get("slide_seg", 0)),
    )
    out = np.concatenate(
        [np.frombuffer(p, dtype=rdt).astype(np.int32) for p in parts]
    ) if parts else np.zeros((0,), np.int32)
    if out.size != header.original_len:
        raise ValueError("decoded length mismatch")
    return out


def lm_compress_text(text: str, tokenizer, **kw) -> bytes:
    """Tokenizer front-end (duck-typed: ``encode(str) -> ids``,
    ``decode(ids) -> str`` — any HuggingFace tokenizer qualifies). Refuses
    loudly when the tokenizer does not round-trip this text exactly
    (normalizing tokenizers are lossy; reference llama_compress.py silently
    inherits that) — use lm_compress_bytes for unconditional losslessness."""
    ids = list(tokenizer.encode(text))
    if tokenizer.decode(ids) != text:
        raise ValueError(
            "tokenizer round-trip is not lossless for this text; "
            "compress the UTF-8 bytes instead (lm_compress_bytes)"
        )
    return lm_compress_tokens(np.asarray(ids, dtype=np.int32), **kw)


def lm_decompress_text(container: bytes, tokenizer, **kw) -> str:
    return tokenizer.decode([int(i) for i in lm_decompress_tokens(container, **kw)])


def auto_prob_bits(cfg, prob_bits: int) -> int:
    """Quantization needs 2**pb >= 2*vocab (every symbol >=1 count with half
    the budget left for the distribution); auto-raise for large vocabs
    (e.g. GPT-2's 50257 -> 17). Travels in the header, so decode follows."""
    while (1 << prob_bits) < 2 * cfg.vocab:
        prob_bits += 1
    return prob_bits


def encode_lm_span(cfg, params, place, data: bytes, start: int, end: int,
                   block_tokens: int, lanes: int, prob_bits: int, overlap: int,
                   cache_grow: int = 0, window_mode: str = "reprime",
                   slide_seg: int = 0):
    """Encode blocks [start, end) of ``data`` in fixed-shape waves of
    ``lanes``; returns ``[(raw_len, token_count, payload)]`` triplets in
    block order (token_count 0 marks the raw fallback). One-wave pipeline:
    wave i's results are fetched while wave i+1 computes.

    A block's payload depends only on (weights, schedule, wave shape,
    block bytes) — not on which lanes its wave-mates occupy — so span
    partitioning (the multi-process driver) cannot change the bitstream.

    ``data`` may also be a 1-D int array (the token-alphabet path,
    lm_compress_tokens): symbols are model token ids; the raw fallback then
    stores minimal-width big-endian ids (``_raw_dtype(cfg.vocab)``)."""
    if isinstance(data, (bytes, bytearray, memoryview)):
        arr = np.frombuffer(data, dtype=np.uint8)
        raw_item = 1
        raw_pack = lambda s0, ln: bytes(data[s0 : s0 + ln])
    else:
        arr = np.ascontiguousarray(data, dtype=np.int32)
        rdt = _raw_dtype(cfg.vocab)
        raw_item = rdt.itemsize
        raw_pack = lambda s0, ln: arr[s0 : s0 + ln].astype(rdt).tobytes()
    n = len(arr)
    out: list[tuple[int, int, bytes]] = []

    def finish(w0: int, nb: int, words_d, nwords_d) -> None:
        words, nwords = np.asarray(words_d), np.asarray(nwords_d)
        for j in range(nb):
            s0 = (w0 + j) * block_tokens
            length = min(block_tokens, n - s0)
            payload = words[j, : nwords[j]].astype(">u4").tobytes()
            if len(payload) >= length * raw_item and length > 0:
                out.append((length, 0, raw_pack(s0, length)))
            else:
                out.append((length, length, payload))

    pending = None
    for w0 in range(start, end, lanes):
        nb = min(lanes, end - w0)
        with jax.profiler.TraceAnnotation("lm/wave_assemble"):
            tokens = np.zeros((lanes, block_tokens), dtype=np.int32)
            lengths = np.zeros((lanes,), dtype=np.int32)
            for j in range(nb):
                chunk = arr[(w0 + j) * block_tokens : (w0 + j + 1) * block_tokens]
                tokens[j, : len(chunk)] = chunk
                lengths[j] = len(chunk)
            tokens_d, lengths_d = place(tokens, lengths)
        with jax.profiler.TraceAnnotation("lm/encode_dispatch"):
            words_d, nwords_d = lm_encode_windowed(
                cfg, params, tokens_d, lengths_d, prob_bits, overlap, cache_grow,
                mode=window_mode, slide_seg=slide_seg,
            )
        if pending is not None:
            finish(*pending)
        pending = (w0, nb, words_d, nwords_d)
    if pending is not None:
        finish(*pending)
    return out


def decode_lm_span(cfg, params, place, blocks, start: int, end: int,
                   block_tokens: int, lanes: int, prob_bits: int, overlap: int,
                   sym_dtype=np.uint8, cache_grow: int = 0,
                   window_mode: str = "reprime", slide_seg: int = 0):
    """Decode container blocks [start, end); returns their packed symbol
    payloads in block order (same wave pipeline as the encoder).
    ``sym_dtype``: how decoded symbols pack into the returned bytes — uint8
    for the byte alphabet, ``_raw_dtype(vocab)`` for the token alphabet
    (must match the encoder's raw-fallback packing)."""
    cap = encode_capacity(block_tokens)
    parts: list[bytes] = [b""] * (end - start)

    def finish(w0: int, nb: int, syms_d) -> None:
        syms = None if syms_d is None else np.asarray(syms_d)
        for j in range(nb):
            blk = blocks[w0 + j]
            if blk.token_count == 0 and blk.raw_len > 0:
                parts[w0 + j - start] = blk.payload
            else:
                parts[w0 + j - start] = syms[j, : blk.token_count].astype(sym_dtype).tobytes()

    pending = None
    for w0 in range(start, end, lanes):
        nb = min(lanes, end - w0)
        with jax.profiler.TraceAnnotation("lm/wave_assemble"):
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
            with jax.profiler.TraceAnnotation("lm/decode_dispatch"):
                words_d, lengths_d = place(words, lengths)
                syms_d = lm_decode_windowed(
                    cfg, params, words_d, lengths_d, prob_bits, block_tokens, overlap,
                    cache_grow, mode=window_mode, slide_seg=slide_seg,
                )
        if pending is not None:
            finish(*pending)
        pending = (w0, nb, syms_d)
    if pending is not None:
        finish(*pending)
    return parts
