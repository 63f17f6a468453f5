"""LM predictor + engine tests: forward-pass invariants, step/prefill
consistency, and bit-exact batched LM round-trips (BASELINE config #2/#3
structure, on a tiny random-init model)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lac_tpu.models.transformer import (
    LMConfig,
    forward,
    init_cache,
    init_params,
    tiny_config,
)
from lac_tpu.runtime.lm_engine import lm_decode, lm_encode, lm_fingerprint


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_config(vocab=61)  # deliberately odd vocab
    params = init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


@pytest.fixture(scope="module")
def tiny_gpt2():
    cfg = tiny_config(
        vocab=61, pos_embedding="learned", norm="layernorm", act="gelu",
        use_bias=True, tie_embeddings=True, n_kv_heads=4,
    )
    params = init_params(cfg, jax.random.PRNGKey(1))
    return cfg, params


def test_forward_shapes_and_dtype(tiny):
    cfg, params = tiny
    cache = init_cache(cfg, 3)
    tokens = jnp.zeros((3, 5), dtype=jnp.int32)
    logits, cache = forward(cfg, params, tokens, cache)
    assert logits.shape == (3, 5, cfg.vocab)
    assert logits.dtype == jnp.float32
    assert int(cache["pos"]) == 5


def test_dtypes_stable_under_x64(tiny):
    """Model code must not weakly promote to f64/i64 when traced under the
    coder's scoped x64 (the classic silent-determinism-killer)."""
    cfg, params = tiny
    with jax.enable_x64(True):
        cache = init_cache(cfg, 1)
        tokens = jnp.zeros((1, 4), dtype=jnp.int32)
        logits, _ = forward(cfg, params, tokens, cache)
        assert logits.dtype == jnp.float32


@pytest.mark.parametrize("fixture", ["tiny", "tiny_gpt2"])
def test_step_matches_prefill(fixture, request):
    """Stepping tokens one at a time must match the prefill logits closely
    (same math, different shapes — allclose, not bit-equal; bit-equality is
    only guaranteed within one shape, which is what the engine relies on)."""
    cfg, params = request.getfixturevalue(fixture)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab, (2, 12)), dtype=jnp.int32)
    logits_pre, _ = forward(cfg, params, tokens, init_cache(cfg, 2))
    cache = init_cache(cfg, 2)
    outs = []
    for t in range(12):
        lg, cache = forward(cfg, params, tokens[:, t : t + 1], cache)
        outs.append(lg[:, 0])
    logits_step = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(logits_pre), np.asarray(logits_step), rtol=2e-4, atol=2e-4
    )


def test_causal_mask_exact(tiny):
    """Exact -inf masking: logits at position t must be bit-identical no
    matter what tokens sit at positions > t (same compiled shape)."""
    cfg, params = tiny
    rng = np.random.default_rng(1)
    base = rng.integers(0, cfg.vocab, (1, 10))
    alt = base.copy()
    alt[0, 6:] = rng.integers(0, cfg.vocab, 4)  # change the future
    la, _ = forward(cfg, params, jnp.asarray(base, dtype=jnp.int32), init_cache(cfg, 1))
    lb, _ = forward(cfg, params, jnp.asarray(alt, dtype=jnp.int32), init_cache(cfg, 1))
    assert (np.asarray(la)[0, :6] == np.asarray(lb)[0, :6]).all()


@pytest.mark.parametrize("fixture", ["tiny", "tiny_gpt2"])
def test_lm_roundtrip(fixture, request):
    cfg, params = request.getfixturevalue(fixture)
    rng = np.random.default_rng(2)
    b, t_len, pb = 4, 24, 16
    lengths = np.array([24, 1, 17, 24], dtype=np.int32)
    tokens = rng.integers(0, cfg.vocab, (b, t_len)).astype(np.int32)
    for i, l in enumerate(lengths):
        tokens[i, l:] = 0
    words, nwords = lm_encode(cfg, params, tokens, lengths, pb)
    decoded = np.asarray(lm_decode(cfg, params, np.asarray(words), lengths, pb, t_len))
    for i in range(b):
        assert (decoded[i, : lengths[i]] == tokens[i, : lengths[i]]).all(), f"lane {i}"


def test_lm_roundtrip_skewed_compresses(tiny):
    """A repetitive sequence must compress below log2(V) bits/symbol even
    with random weights (the model still sharpens on-context)... at minimum
    the round-trip must be exact and sizes bounded."""
    cfg, params = tiny
    b, t_len, pb = 2, 32, 16
    tokens = np.tile(np.array([7, 7, 7, 9], dtype=np.int32), (b, 8))
    lengths = np.full(b, t_len, dtype=np.int32)
    words, nwords = lm_encode(cfg, params, tokens, lengths, pb)
    decoded = np.asarray(lm_decode(cfg, params, np.asarray(words), lengths, pb, t_len))
    assert (decoded == tokens).all()
    assert int(np.asarray(nwords).max()) <= t_len + 2


def test_fingerprint_stable(tiny):
    cfg, params = tiny
    f1 = lm_fingerprint(cfg, params, 16)
    f2 = lm_fingerprint(cfg, params, 16)
    assert f1 == f2
    # different weights => different fingerprint
    params2 = init_params(cfg, jax.random.PRNGKey(99))
    assert lm_fingerprint(cfg, params2, 16) != f1


def test_encode_twice_bit_identical(tiny):
    """Same input encoded twice must produce identical bitstreams (the
    race-detection analog for this framework: determinism checks,
    SURVEY.md §5)."""
    cfg, params = tiny
    rng = np.random.default_rng(5)
    tokens = rng.integers(0, cfg.vocab, (3, 20)).astype(np.int32)
    lengths = np.full(3, 20, dtype=np.int32)
    w1, n1 = lm_encode(cfg, params, tokens, lengths, 16)
    w2, n2 = lm_encode(cfg, params, tokens, lengths, 16)
    assert (np.asarray(n1) == np.asarray(n2)).all()
    assert (np.asarray(w1) == np.asarray(w2)).all()
