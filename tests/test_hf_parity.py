"""Architecture parity: our transformer forward must match HuggingFace's
torch implementations on random tiny models (proves pretrained GPT-2/Llama
checkpoints load correctly — the capability of reference llama_compress.py's
llama.cpp dependency, validated without network access)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from lac_tpu.models.hf_loader import config_from_hf, params_from_hf_state_dict
from lac_tpu.models.transformer import forward, init_cache


def _logits_ours(cfg, params, tokens: np.ndarray) -> np.ndarray:
    cache = init_cache(cfg, tokens.shape[0])
    logits, _ = forward(cfg, params, jnp.asarray(tokens, dtype=jnp.int32), cache)
    return np.asarray(logits)


def _check_parity(hf_model, hf_cfg, bos: int, atol: float):
    cfg = config_from_hf(hf_cfg, dtype=jnp.float32)
    params = params_from_hf_state_dict(cfg, hf_model.state_dict(), bos)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, cfg.vocab, (2, 12))
    with torch.no_grad():
        ref = hf_model(torch.tensor(tokens)).logits.float().numpy()
    ours = _logits_ours(cfg, params, tokens)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=atol)


def test_gpt2_parity():
    hf_cfg = transformers.GPT2Config(
        vocab_size=97, n_positions=64, n_embd=48, n_layer=2, n_head=4
    )
    model = transformers.GPT2LMHeadModel(hf_cfg).eval()
    _check_parity(model, hf_cfg, bos=96, atol=2e-3)


def test_llama_parity():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=89,
        hidden_size=64,
        intermediate_size=112,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    _check_parity(model, hf_cfg, bos=1, atol=2e-3)


def test_llama_parity_stepwise():
    """KV-cache stepping must also match HF (the decode path)."""
    hf_cfg = transformers.LlamaConfig(
        vocab_size=53, hidden_size=32, intermediate_size=56,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=32,
    )
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg, dtype=jnp.float32)
    params = params_from_hf_state_dict(cfg, model.state_dict(), 1)
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, cfg.vocab, (1, 10))
    with torch.no_grad():
        ref = model(torch.tensor(tokens)).logits.float().numpy()
    cache = init_cache(cfg, 1)
    outs = []
    for t in range(10):
        lg, cache = forward(
            cfg, params, jnp.asarray(tokens[:, t : t + 1], dtype=jnp.int32), cache
        )
        outs.append(np.asarray(lg)[:, 0])
    ours = np.stack(outs, axis=1)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)
