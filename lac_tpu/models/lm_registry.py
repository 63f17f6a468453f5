"""LM model registry: container ``model_ref`` -> (LMConfig, params).

A container must be decodable from its own metadata, so every LM predictor
is named by a reproducible reference string:

- ``prng:<preset>:<seed>``  — deterministic random-init model (presets from
  models.transformer); fully self-contained, used by tests and benches
  (this image ships no pretrained checkpoints).
- ``hf:<path-or-id>``       — local HuggingFace checkpoint via
  models.hf_loader (no downloads).

The container also stores a CDF fingerprint (runtime.lm_engine) so a decoder
with different weights/stack fails loudly before emitting garbage.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from . import transformer as tfm
from .transformer import LMConfig, init_params

__all__ = ["resolve_lm", "PRESETS"]

PRESETS = {
    "tiny": lambda: tfm.tiny_config(vocab=256, max_seq=256),
    "tiny-gpt2": lambda: tfm.tiny_config(
        vocab=256, max_seq=256, pos_embedding="learned", norm="layernorm",
        act="gelu", use_bias=True, tie_embeddings=True, n_kv_heads=4,
    ),
    "byte-12l": lambda: LMConfig(          # ~28M-param byte LM (flagship
        vocab=256, d_model=384, n_layers=12, n_heads=6, n_kv_heads=6,
        d_ff=1536, max_seq=1024, dtype=jnp.bfloat16,   # byte-level config)
    ),
    "byte-12l-mqa": lambda: LMConfig(      # byte-12l with MQA: 1 KV head.
        vocab=256, d_model=384, n_layers=12, n_heads=6, n_kv_heads=1,
        d_ff=1536, max_seq=1024, dtype=jnp.bfloat16,
        # lock-step coding is KV-cache-bandwidth-bound (every step reads the
        # whole cache), so 6x fewer KV heads is ~6x the coding ceiling for
        # a small ratio cost — the serving-style tradeoff, applied to coding
    ),
    "byte-16l": lambda: LMConfig(          # ~67M-param byte LM: the ratio
        vocab=256, d_model=512, n_layers=16, n_heads=8, n_kv_heads=8,
        d_ff=2048, max_seq=1024, dtype=jnp.bfloat16,
        # flagship scale-up of byte-12l (2.4x params, trained at seq 1024
        # so the usable coding window doubles — the two ratio levers the
        # byte-12l ablations left on the table)
    ),
    "byte-6l": lambda: LMConfig(           # ~6M-param byte LM: small enough
        vocab=256, d_model=256, n_layers=6, n_heads=4, n_kv_heads=4,
        d_ff=1024, max_seq=1024, dtype=jnp.bfloat16,   # to ship trained
    ),
    "gpt2": lambda: tfm.GPT2_SMALL,
    "tinyllama": lambda: tfm.TINYLLAMA_1B,
    "llama2-7b": lambda: tfm.LLAMA2_7B,
    "llama3-8b": lambda: tfm.LLAMA3_8B,
}


def resolve_lm(model_ref: str, max_seq: int | None = None):
    """model_ref -> (LMConfig, params)."""
    kind, _, rest = model_ref.partition(":")
    if kind == "prng":
        preset, _, seed = rest.partition(":")
        if preset not in PRESETS:
            raise KeyError(f"unknown preset '{preset}'; known: {sorted(PRESETS)}")
        cfg = PRESETS[preset]()
        if max_seq is not None:
            cfg = dataclasses.replace(cfg, max_seq=max_seq)
        params = init_params(cfg, jax.random.PRNGKey(int(seed or 0)))
        return cfg, params
    if kind == "hf":
        from .hf_loader import load_hf_model

        cfg, params = load_hf_model(rest)
        if max_seq is not None:
            cfg = dataclasses.replace(cfg, max_seq=max_seq)
        return cfg, params
    if kind == "file":
        from ..train import load_checkpoint

        cfg, params = load_checkpoint(rest)
        if max_seq is not None:
            cfg = dataclasses.replace(cfg, max_seq=max_seq)
        return cfg, params
    raise KeyError(f"unknown model_ref kind '{kind}' (want prng:, hf: or file:)")
