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
