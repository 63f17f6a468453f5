"""Chunked det8 encode == serial stepping, bit for bit.

The float LM path must encode with the decoder's exact serial graph (same
schedule -> same float bits). The det8 forward removes that constraint by
construction — all order-sensitive reductions are int32 and every
quantization scale is row-local — so the engine encodes CHUNK tokens per
forward (runtime.lm_engine._seg_intervals_chunked) while decode still steps
one token at a time. These tests pin the contract:

- an s-token cache-route forward produces bit-identical logits to s serial
  steps at the same positions (transformer._det_softmax cap=2W +
  _det_attn_out_cached associative split);
- the engine's chunked interval collection equals the serial scan for every
  chunk size, including chunk=1 and a non-dividing tail;
- the public API round-trips det8 containers whose encode ran chunked,
  windowed (reprime boundaries) and not.

Reference capability: llama_compress.py:24-39 (the reference encodes
token-serially in both directions; this is the TPU-native upgrade the
float path cannot have).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lac_tpu.models.transformer import forward, init_cache, init_params, tiny_config
from lac_tpu.runtime import lm_engine as E


def _mk(seed=0, **kw):
    cfg = tiny_config(vocab=61, n_heads=4, n_kv_heads=2, max_seq=32, det8=True, **kw)
    params = init_params(cfg, jax.random.PRNGKey(seed))
    return cfg, params


_fwd = jax.jit(forward, static_argnums=(0,))


def test_chunk_forward_logits_match_serial():
    cfg, params = _mk()
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, cfg.vocab, (3, 24)).astype(np.int32))
    logits_c, _ = _fwd(cfg, params, toks, init_cache(cfg, 3, 32))
    cache = init_cache(cfg, 3, 32)
    rows = []
    for t in range(24):
        lg, cache = _fwd(cfg, params, toks[:, t : t + 1], cache)
        rows.append(np.asarray(lg[:, 0]))
    serial = np.stack(rows, axis=1)
    assert (np.asarray(logits_c) == serial).all(), (
        "det8 chunked forward bits != serial stepping"
    )


def test_chunk_forward_resumes_mid_cache():
    """Chunk boundaries may fall anywhere: a chunk starting at pos>0 attends
    to real cache rows AND fresh rows; its logits must still match serial."""
    cfg, params = _mk(seed=3)
    rng = np.random.default_rng(5)
    toks = jnp.asarray(rng.integers(0, cfg.vocab, (2, 20)).astype(np.int32))
    cache = init_cache(cfg, 2, 32)
    la, cache = _fwd(cfg, params, toks[:, :7], cache)
    lb, cache = _fwd(cfg, params, toks[:, 7:], cache)
    chunked = np.concatenate([np.asarray(la), np.asarray(lb)], axis=1)
    cache = init_cache(cfg, 2, 32)
    rows = []
    for t in range(20):
        lg, cache = _fwd(cfg, params, toks[:, t : t + 1], cache)
        rows.append(np.asarray(lg[:, 0]))
    assert (chunked == np.stack(rows, axis=1)).all()


@pytest.mark.parametrize("chunk", [1, 5, 8, 64])
def test_engine_intervals_chunked_match_serial(chunk, monkeypatch):
    monkeypatch.setenv("LAC_DET_ENCODE_CHUNK", str(chunk))
    cfg, params = _mk(seed=1)
    rng = np.random.default_rng(2)
    b, t, pb = 4, 24, 12
    toks = jnp.asarray(rng.integers(0, cfg.vocab, (b, t)).astype(np.int32))
    lens = jnp.full((b,), t, dtype=jnp.int32)
    lo_s, f_s = E._encode_intervals(cfg, params, toks, lens, pb)
    lo_c, f_c = E._encode_intervals_det(cfg, params, toks, pb)
    assert (np.asarray(lo_s) == np.asarray(lo_c)).all()
    assert (np.asarray(f_s) == np.asarray(f_c)).all()


def test_windowed_encode_chunked_matches_serial_segments(monkeypatch):
    """Full windowed interval stream: chunked segments (with reprime
    boundaries and a ragged tail) == the serial segment scan. Compares the
    (cdf_lo, freq) interval arrays — the model-side product; the rANS stage
    downstream is identical machinery either way (and the API round-trip
    test covers it end to end)."""
    monkeypatch.setenv("LAC_DET_ENCODE_CHUNK", "8")
    cfg, params = _mk(seed=2)
    rng = np.random.default_rng(7)
    b, t, pb = 3, 83, 12  # > max_seq -> reprimes; 83 leaves ragged chunks
    toks = np.zeros((b, t), dtype=np.int32)
    lens = np.array([83, 60, 41], dtype=np.int32)
    for j, n in enumerate(lens):
        toks[j, :n] = rng.integers(0, cfg.vocab, n)
    toks_j = jnp.asarray(toks)
    from lac_tpu.ops.quantize import gather_intervals

    def run(serial: bool):
        segs, keep = E.window_schedule(t, cfg.max_seq, 2)
        cache = init_cache(cfg, b)
        prev = jnp.full((b,), cfg.bos_id, dtype=jnp.int32)
        los, fs = [], []
        for t0, steps, reprime in segs:
            if reprime:
                kept = toks_j[:, t0 - keep : t0]
                cdf, cache = E._reprime_cdf(cfg, params, kept, pb)
                lo0, f0 = gather_intervals(cdf, toks_j[:, t0])
                los.append(np.asarray(lo0, np.int32)[:, None])
                fs.append(np.asarray(f0, np.int32)[:, None])
                prev = toks_j[:, t0]
                t0, steps = t0 + 1, steps - 1
                if steps == 0:
                    continue
            seg = toks_j[:, t0 : t0 + steps]
            if serial:
                cache, prev, lo, f = E._seg_intervals(
                    cfg, params, cache, prev, seg, pb, steps)
            else:
                cache, prev, lo, f = E._seg_intervals_chunked(
                    cfg, params, cache, prev, seg, pb)
            los.append(np.asarray(lo))
            fs.append(np.asarray(f))
        return np.concatenate(los, axis=1), np.concatenate(fs, axis=1)

    lo_s, f_s = run(serial=True)
    lo_c, f_c = run(serial=False)
    assert (lo_s == lo_c).all()
    assert (f_s == f_c).all()


def test_det8_chunked_api_roundtrip(monkeypatch):
    """Public API: chunked det8 encode -> serial decode, bytes equal, both
    windowed (block > context) and single-window."""
    from lac_tpu.runtime.lm_api import lm_compress_bytes, lm_decompress_bytes

    monkeypatch.setenv("LAC_DET_ENCODE_CHUNK", "16")
    data = bytes(
        np.random.default_rng(11).integers(32, 90, 1500, dtype=np.uint8)
    ) + b"chunked det8 encode " * 40
    for block_tokens in (32, 96):
        c = lm_compress_bytes(
            data, model_ref="prng:tiny:0", block_tokens=block_tokens,
            lanes=4, det8=True)
        assert lm_decompress_bytes(c) == data


def test_det8_bf16_forward_rounds_via_reduce_precision():
    """XLA hazard #4 regression guard (docs/DESIGN.md §6): under det8 with a
    sub-f32 model dtype, every model-dtype rounding must be an explicit
    ``reduce_precision`` (the excess-precision pass elides convert-pair
    roundings SHAPE-DEPENDENTLY on TPU, which broke chunk==serial). The CPU
    backend can't reproduce the elision, so pin the graph property instead:
    the jaxpr carries reduce_precision ops and no bf16-typed intermediates
    flow between layer stages (activations stay f32-typed, rounded in
    value)."""
    cfg, params = _mk(dtype=jnp.bfloat16)
    cache = init_cache(cfg, 2, 16)
    toks = jnp.zeros((2, 4), jnp.int32)
    jaxpr = jax.make_jaxpr(lambda p, t, c: forward(cfg, p, t, c))(params, toks, cache)

    def prims(jx):
        for eq in jx.eqns:
            yield eq
            for sub in jax.core.jaxprs_in_params(eq.params):
                yield from prims(sub)

    names = [eq.primitive.name for eq in prims(jaxpr.jaxpr)]
    assert names.count("reduce_precision") > 0
    # the only f32->bf16 converts feed the KV-cache buffers (stacked fresh
    # K and V); a rounding cast anywhere else would be elidable
    bf16_converts = [
        eq for eq in prims(jaxpr.jaxpr)
        if eq.primitive.name == "convert_element_type"
        and eq.params.get("new_dtype") == jnp.bfloat16
    ]
    assert len(bf16_converts) == 2, [str(e) for e in bf16_converts]


def test_det8_bf16_chunk_matches_serial_logits():
    """chunk==serial under bf16 activations on this backend (value-level
    companion to the graph-property guard above)."""
    cfg, params = _mk(seed=3, dtype=jnp.bfloat16)
    b, t = 2, 12
    rng = np.random.default_rng(9)
    toks = jnp.asarray(rng.integers(0, cfg.vocab, (b, t)).astype(np.int32))
    cache0 = init_cache(cfg, b, 16)
    chunk_logits, _ = _fwd(cfg, params, toks, cache0)
    cache = init_cache(cfg, b, 16)
    outs = []
    for i in range(t):
        lg, cache = _fwd(cfg, params, toks[:, i : i + 1], cache)
        outs.append(np.asarray(lg)[:, 0])
    serial = np.stack(outs, axis=1)
    assert np.array_equal(np.asarray(chunk_logits), serial)


# --------------------------------------------------------------------------
# det8 + slide: the chunked encode must stay bit-identical to the serial
# decode across the ring (ring-age mask + ring-aligned chunk splits).
# --------------------------------------------------------------------------


def _det_slide_case(t_len=40, w=16, seed=0, vocab=41):
    import jax

    from lac_tpu.models.transformer import init_params, tiny_config

    cfg = tiny_config(vocab=vocab, max_seq=w, det8=True)
    params = init_params(
        tiny_config(vocab=vocab, max_seq=w), jax.random.PRNGKey(seed))
    rng = np.random.default_rng(seed + 1)
    tokens = rng.integers(0, vocab, (2, t_len)).astype(np.int32)
    lengths = np.full(2, t_len, dtype=np.int32)
    return cfg, params, tokens, lengths


def test_det8_slide_roundtrip_across_wraps():
    """Encode is chunked (prefill-shaped), decode is serial, the block wraps
    the ring multiple times — the round-trip being exact IS the bit-identity
    proof (any CDF divergence derails the rANS stream catastrophically)."""
    from lac_tpu.runtime.lm_engine import lm_decode_windowed, lm_encode_windowed

    cfg, params, tokens, lengths = _det_slide_case(t_len=40, w=16)
    pb = 14
    words, _ = lm_encode_windowed(cfg, params, tokens, lengths, pb, mode="slide")
    out = np.asarray(lm_decode_windowed(
        cfg, params, np.asarray(words), lengths, pb, 40, mode="slide"))
    assert (out == tokens).all()


def test_det8_slide_chunk_size_invariant(monkeypatch):
    """The bitstream must not depend on the encode chunk geometry (det8's
    core contract, extended over the ring)."""
    from lac_tpu.runtime.lm_engine import lm_encode_windowed

    cfg, params, tokens, lengths = _det_slide_case(t_len=37, w=16, seed=3)
    outs = []
    for chunk in ("5", "16"):
        monkeypatch.setenv("LAC_DET_ENCODE_CHUNK", chunk)
        w, n = lm_encode_windowed(cfg, params, tokens, lengths, 14, mode="slide")
        outs.append((np.asarray(w), np.asarray(n)))
    assert (outs[0][1] == outs[1][1]).all()
    assert (outs[0][0] == outs[1][0]).all()


def test_det8_slide_container_explicit():
    """det8 slide round-trips through the container, and auto now resolves
    det8 to slide too (the worker-crashing single-scan decode was replaced
    by bounded segments — lm_engine._decode_scan_slide_seg, TPU-proven in
    measurements/r3_slide_det8_seg.log)."""
    from lac_tpu.runtime.lm_api import lm_compress_bytes, lm_decompress_bytes
    from lac_tpu.stream.container import read_container

    data = bytes(range(256)) * 4
    c = lm_compress_bytes(data, model_ref="prng:tiny:0", block_tokens=300,
                          lanes=2, det8=True, window_mode="slide", cache_grow=0)
    header, _ = read_container(c)
    assert header.config["window_mode"] == "slide"
    assert header.config["det8"] is True
    assert lm_decompress_bytes(c) == data

    c2 = lm_compress_bytes(data, model_ref="prng:tiny:0", block_tokens=300,
                           lanes=2, det8=True, window_mode="auto", cache_grow=0)
    header2, _ = read_container(c2)
    assert header2.config["window_mode"] == "slide"
    assert lm_decompress_bytes(c2) == data


def test_det8_slide_decode_segment_size_invariant(monkeypatch):
    """Slide-mode det8 decode runs in bounded-scan segments (the single
    long-scan program crashes the TPU worker — lm_engine
    _decode_scan_slide_seg). The segment length must not change the decoded
    bits: same per-step computation, det8 shape invariance."""
    from lac_tpu.runtime import lm_engine
    from lac_tpu.runtime.lm_engine import lm_decode_windowed, lm_encode_windowed

    cfg, params, tokens, lengths = _det_slide_case(t_len=37, w=16, seed=5)
    w, _ = lm_encode_windowed(cfg, params, tokens, lengths, 14, mode="slide")
    wn = np.asarray(w)
    outs = []
    for seg in (7, 16, 512):  # uneven tail / ring-aligned / one segment
        monkeypatch.setattr(lm_engine, "_SLIDE_SEG", seg)
        out = np.asarray(lm_decode_windowed(
            cfg, params, wn, lengths, 14, 37, mode="slide"))
        assert (out == tokens).all(), f"seg={seg} round-trip mismatch"
        outs.append(out)
    for o in outs[1:]:
        assert (o == outs[0]).all()
