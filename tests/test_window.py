"""Sliding-window re-prime mode: blocks longer than the model context
(reference llama_compress.py:31-39 semantics, deterministic both ways)."""

import numpy as np
import pytest

import jax

from lac_tpu.models.transformer import init_params, tiny_config
from lac_tpu.runtime.lm_engine import (
    lm_decode_windowed,
    lm_encode_windowed,
    window_schedule,
)


def test_schedule_shape():
    segs, keep = window_schedule(t_len=50, window=16, overlap=2)
    assert keep == 8
    # first segment fills the window; later segments code window-keep each
    assert segs[0] == (0, 16, False)
    assert segs[1] == (16, 8, True)
    total = sum(s for _, s, _ in segs)
    assert total == 50


def test_schedule_exact_fit():
    segs, keep = window_schedule(t_len=16, window=16, overlap=2)
    assert segs == [(0, 16, False)]


@pytest.mark.parametrize("t_len", [17, 31, 48, 50])
def test_windowed_roundtrip(t_len):
    cfg = tiny_config(vocab=41, max_seq=16)
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(t_len)
    b, pb = 3, 14
    lengths = np.array([t_len, max(1, t_len - 5), t_len], dtype=np.int32)
    tokens = rng.integers(0, cfg.vocab, (b, t_len)).astype(np.int32)
    for i, l in enumerate(lengths):
        tokens[i, l:] = 0
    words, nwords = lm_encode_windowed(cfg, params, tokens, lengths, pb)
    out = np.asarray(
        lm_decode_windowed(cfg, params, np.asarray(words), lengths, pb, t_len)
    )
    for i in range(b):
        assert (out[i, : lengths[i]] == tokens[i, : lengths[i]]).all(), f"lane {i}"


def test_windowed_matches_plain_when_fits():
    """When the block fits the context, windowed mode must produce the
    identical bitstream as the plain engine."""
    from lac_tpu.runtime.lm_engine import lm_encode

    cfg = tiny_config(vocab=17, max_seq=32)
    params = init_params(cfg, jax.random.PRNGKey(1))
    rng = np.random.default_rng(5)
    tokens = rng.integers(0, cfg.vocab, (2, 20)).astype(np.int32)
    lengths = np.full(2, 20, dtype=np.int32)
    w1, n1 = lm_encode(cfg, params, tokens, lengths, 12)
    w2, n2 = lm_encode_windowed(cfg, params, tokens, lengths, 12)
    assert (np.asarray(n1) == np.asarray(n2)).all()
    assert (np.asarray(w1) == np.asarray(w2)).all()


# --------------------------------------------------------------------------
# Slide mode (ring-buffer cache, LMConfig.slide): no re-prime prefills;
# global RoPE positions keep relative offsets exact (R(a)^T R(b) = R(b-a)).
# --------------------------------------------------------------------------


@pytest.mark.parametrize("t_len", [17, 48, 50])
def test_slide_roundtrip(t_len):
    cfg = tiny_config(vocab=41, max_seq=16)
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(t_len)
    b, pb = 3, 14
    lengths = np.array([t_len, max(1, t_len - 5), t_len], dtype=np.int32)
    tokens = rng.integers(0, cfg.vocab, (b, t_len)).astype(np.int32)
    for i, l in enumerate(lengths):
        tokens[i, l:] = 0
    words, _ = lm_encode_windowed(cfg, params, tokens, lengths, pb, mode="slide")
    out = np.asarray(lm_decode_windowed(
        cfg, params, np.asarray(words), lengths, pb, t_len, mode="slide"))
    for i in range(b):
        assert (out[i, : lengths[i]] == tokens[i, : lengths[i]]).all(), f"lane {i}"


def test_slide_kv8_w8_roundtrip():
    import dataclasses

    base = tiny_config(vocab=41, max_seq=16)
    rng = np.random.default_rng(7)
    t_len, pb = 40, 14
    tokens = rng.integers(0, base.vocab, (2, t_len)).astype(np.int32)
    lengths = np.full(2, t_len, dtype=np.int32)
    for mode_kw in ({"kv8": True}, {"w8": True}):
        cfg = dataclasses.replace(base, **mode_kw)
        params = init_params(base, jax.random.PRNGKey(2))
        words, _ = lm_encode_windowed(cfg, params, tokens, lengths, pb, mode="slide")
        out = np.asarray(lm_decode_windowed(
            cfg, params, np.asarray(words), lengths, pb, t_len, mode="slide"))
        assert (out == tokens).all(), mode_kw


def test_slide_differs_from_reprime():
    """Past the context, slide and reprime are different schedules and must
    produce different bitstreams (each self-consistent — see roundtrips)."""
    cfg = tiny_config(vocab=41, max_seq=16)
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    tokens = rng.integers(0, cfg.vocab, (2, 48)).astype(np.int32)
    lengths = np.full(2, 48, dtype=np.int32)
    wr, nr = lm_encode_windowed(cfg, params, tokens, lengths, 14, mode="reprime")
    ws, ns = lm_encode_windowed(cfg, params, tokens, lengths, 14, mode="slide")
    same = (np.asarray(nr) == np.asarray(ns)).all() and (
        np.asarray(wr) == np.asarray(ws)).all()
    assert not same


def test_slide_ring_semantics_one_layer():
    """Semantic oracle for the ring buffer: with ONE layer, the slide-mode
    CDF-producing logits at global step p must match a fresh forward over
    exactly the last W tokens at re-based positions (RoPE relativity), up to
    float tolerance (different absolute rotations, same relative offsets)."""
    import dataclasses

    import jax.numpy as jnp

    from lac_tpu.models.transformer import forward, init_cache

    W = 8
    cfg = tiny_config(vocab=23, max_seq=W, n_layers=1, dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(4))
    scfg = dataclasses.replace(cfg, slide=True)
    rng = np.random.default_rng(11)
    toks = rng.integers(0, cfg.vocab, (1, 3 * W)).astype(np.int32)

    # drive the slide forward serially over the whole stream
    cache = init_cache(scfg, 1)
    prev = np.full((1, 1), cfg.bos_id, dtype=np.int32)
    slide_logits = []
    for t in range(toks.shape[1]):
        lg, cache = forward(scfg, params, jnp.asarray(prev), cache)
        slide_logits.append(np.asarray(lg[:, 0]))
        prev = toks[:, t : t + 1]

    # oracle at a step past one full wrap: at step p the slide forward's
    # query (input toks[p-1]) attends the W cached inputs toks[p-W-1..p-2]
    # plus itself — a fresh prefill of those W+1 tokens at re-based
    # positions must give the same last-position logits
    p = 2 * W + 3
    ctx = toks[:, p - W - 1 : p]
    ocfg = dataclasses.replace(cfg, max_seq=W + 2)
    fcache = init_cache(ocfg, 1)
    flg, _ = forward(ocfg, params, jnp.asarray(ctx), fcache, prefill=True)
    np.testing.assert_allclose(
        slide_logits[p][0], np.asarray(flg[0, -1]), rtol=2e-4, atol=2e-4
    )


def test_slide_rejects_learned_positions():
    import dataclasses

    cfg = tiny_config(vocab=17, max_seq=16)
    with pytest.raises(ValueError):
        dataclasses.replace(cfg, slide=True, pos_embedding="learned")


def test_slide_container_roundtrip():
    from lac_tpu.runtime.lm_api import lm_compress_bytes, lm_decompress_bytes
    from lac_tpu.stream.container import read_container

    data = bytes(range(256)) * 5
    c = lm_compress_bytes(
        data, model_ref="prng:tiny:0", block_tokens=300, lanes=2,
        window_mode="slide", cache_grow=0,
    )
    header, _ = read_container(c)
    assert header.config["window_mode"] == "slide"
    assert lm_decompress_bytes(c) == data


def test_window_mode_auto_resolution():
    """auto -> slide for rope float models, reprime for det8/learned; the
    container records the RESOLVED mode."""
    import dataclasses

    from lac_tpu.runtime.lm_api import _resolve_window_mode
    from lac_tpu.models.transformer import tiny_config

    cfg = tiny_config(vocab=300)
    assert _resolve_window_mode("auto", cfg) == "slide"
    # det8+slide decodes in bounded-scan segments (the single long-scan
    # program crashed the TPU worker; lm_engine._decode_scan_slide_seg) —
    # proven clean on chip at block 4096 (r3_slide_det8_seg.log) and at the
    # flagship block 16384 (r4_slide_det8_b16k.log), so auto routes det8 to
    # slide at every block (the round-3 block gate is closed)
    det8 = dataclasses.replace(cfg, det8=True)
    assert _resolve_window_mode("auto", det8) == "slide"
    assert _resolve_window_mode(
        "auto", dataclasses.replace(cfg, pos_embedding="learned")) == "reprime"
    assert _resolve_window_mode("reprime", cfg) == "reprime"
    # explicit mode always honors the caller (the container records the
    # RESOLVED mode; only "auto" may be rewritten)
    assert _resolve_window_mode("slide", det8) == "slide"


# --------------------------------------------------------------------------
# Segmented float slide schedule (slide_seg): both sides run the serial
# steps in bounded ≤seg-step scan programs — the crash-free wide-lane
# schedule at the flagship block (VERDICT r3 item 3).
# --------------------------------------------------------------------------


@pytest.mark.parametrize("seg", [5, 16, 64])
def test_slide_seg_roundtrip(seg):
    cfg = tiny_config(vocab=41, max_seq=16)
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(seg)
    b, pb, t_len = 3, 14, 50
    lengths = np.array([t_len, t_len - 7, t_len], dtype=np.int32)
    tokens = rng.integers(0, cfg.vocab, (b, t_len)).astype(np.int32)
    for i, l in enumerate(lengths):
        tokens[i, l:] = 0
    words, _ = lm_encode_windowed(
        cfg, params, tokens, lengths, pb, mode="slide", slide_seg=seg)
    out = np.asarray(lm_decode_windowed(
        cfg, params, np.asarray(words), lengths, pb, t_len, mode="slide",
        slide_seg=seg))
    for i in range(b):
        assert (out[i, : lengths[i]] == tokens[i, : lengths[i]]).all(), f"lane {i}"


def test_slide_seg_kv8_w8_roundtrip():
    import dataclasses

    base = tiny_config(vocab=41, max_seq=16)
    rng = np.random.default_rng(9)
    t_len, pb = 40, 14
    tokens = rng.integers(0, base.vocab, (2, t_len)).astype(np.int32)
    lengths = np.full(2, t_len, dtype=np.int32)
    for mode_kw in ({"kv8": True}, {"w8": True}):
        cfg = dataclasses.replace(base, **mode_kw)
        params = init_params(base, jax.random.PRNGKey(2))
        words, _ = lm_encode_windowed(
            cfg, params, tokens, lengths, pb, mode="slide", slide_seg=16)
        out = np.asarray(lm_decode_windowed(
            cfg, params, np.asarray(words), lengths, pb, t_len, mode="slide",
            slide_seg=16))
        assert (out == tokens).all(), mode_kw


def test_slide_seg_container_default_and_roundtrip():
    """Float slide past the context resolves slide_seg to the engine default,
    records it, and the decode replays it; forcing 0 keeps the legacy
    single-scan container."""
    from lac_tpu.runtime.lm_api import lm_compress_bytes, lm_decompress_bytes
    from lac_tpu.runtime.lm_engine import _SLIDE_SEG
    from lac_tpu.stream.container import read_container

    data = bytes(range(256)) * 5
    c = lm_compress_bytes(
        data, model_ref="prng:tiny:0", block_tokens=300, lanes=2,
        window_mode="slide", cache_grow=0,
    )
    header, _ = read_container(c)
    assert header.config["slide_seg"] == _SLIDE_SEG
    assert lm_decompress_bytes(c) == data

    c0 = lm_compress_bytes(
        data, model_ref="prng:tiny:0", block_tokens=300, lanes=2,
        window_mode="slide", cache_grow=0, slide_seg=0,
    )
    header0, _ = read_container(c0)
    assert header0.config["slide_seg"] == 0
    assert lm_decompress_bytes(c0) == data


def test_slide_seg_fingerprint_gate():
    """A decoder that ignores the recorded slide_seg must fail the
    fingerprint gate loudly, not mis-decode (lm_fingerprint folds it)."""
    from lac_tpu.models.lm_registry import resolve_lm
    from lac_tpu.runtime.lm_engine import lm_fingerprint

    cfg, params = resolve_lm("prng:tiny:0", None)
    assert lm_fingerprint(cfg, params, 16, 0, 512) != lm_fingerprint(
        cfg, params, 16, 0, 0)


def test_auto_container_records_resolved_mode():
    from lac_tpu.runtime.lm_api import lm_compress_bytes, lm_decompress_bytes
    from lac_tpu.stream.container import read_container

    data = bytes(range(256)) * 4
    c = lm_compress_bytes(data, model_ref="prng:tiny:0", block_tokens=300,
                          lanes=2, window_mode="auto", cache_grow=0)
    header, _ = read_container(c)
    assert header.config["window_mode"] == "slide"
    assert lm_decompress_bytes(c) == data
