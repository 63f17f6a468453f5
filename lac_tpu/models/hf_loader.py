"""HuggingFace checkpoint -> lac_tpu param tree converters.

Replaces the reference's llama.cpp GGML model loading (llama_compress.py:4-9)
with TPU-native weight ingestion: HF state dicts (GPT-2 and Llama families)
map onto models.transformer param trees. Works from any local checkpoint
directory or a transformers model object — no network access is assumed
anywhere (this image has zero egress; tests build random tiny HF models
offline and assert our forward matches HF's to float tolerance).

Conventions handled:
- GPT-2 Conv1D stores weights [in, out] (no transpose needed for our
  [in, out] layout); attn.c_attn is fused qkv and is split;
- Llama nn.Linear stores [out, in] -> transposed;
- RoPE is the non-interleaved (rotate_half) convention in both HF Llama and
  models.transformer._rope;
- our embedding has vocab+1 rows: the extra BOS row is filled with the
  checkpoint's BOS/EOS embedding so coding can prime deterministically
  (reference primes with the Llama BOS, llama_compress.py:20-23).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .transformer import LMConfig, stack_layers

__all__ = ["config_from_hf", "params_from_hf_state_dict", "load_hf_model"]


def _j(x, dtype):
    return jnp.asarray(np.asarray(x), dtype=dtype)


def config_from_hf(hf_config, dtype=jnp.bfloat16) -> LMConfig:
    """Build an LMConfig from a transformers config object."""
    mt = hf_config.model_type
    if mt == "gpt2":
        return LMConfig(
            vocab=hf_config.vocab_size,
            d_model=hf_config.n_embd,
            n_layers=hf_config.n_layer,
            n_heads=hf_config.n_head,
            n_kv_heads=hf_config.n_head,
            d_ff=4 * hf_config.n_embd,
            max_seq=hf_config.n_positions,
            pos_embedding="learned",
            norm="layernorm",
            act="gelu",
            use_bias=True,
            tie_embeddings=True,
            dtype=dtype,
            norm_eps=hf_config.layer_norm_epsilon,
        )
    if mt == "llama":
        return LMConfig(
            vocab=hf_config.vocab_size,
            d_model=hf_config.hidden_size,
            n_layers=hf_config.num_hidden_layers,
            n_heads=hf_config.num_attention_heads,
            n_kv_heads=hf_config.num_key_value_heads,
            d_ff=hf_config.intermediate_size,
            max_seq=hf_config.max_position_embeddings,
            pos_embedding="rope",
            norm="rmsnorm",
            act="silu_glu",
            use_bias=False,
            tie_embeddings=getattr(hf_config, "tie_word_embeddings", False),
            dtype=dtype,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            norm_eps=hf_config.rms_norm_eps,
        )
    raise ValueError(f"unsupported HF model_type '{mt}'")


def params_from_hf_state_dict(cfg: LMConfig, sd: dict, bos_token_id: int) -> dict:
    """sd: name -> array-like (torch tensors, numpy arrays, ...)."""
    sd = {k: np.asarray(getattr(v, "detach", lambda: v)().cpu().numpy() if hasattr(v, "cpu") else v)
          for k, v in sd.items()}
    dt = cfg.dtype
    if cfg.pos_embedding == "learned":
        return _gpt2_params(cfg, sd, bos_token_id, dt)
    return _llama_params(cfg, sd, bos_token_id, dt)


def _with_bos_row(embed: np.ndarray, bos_token_id: int) -> np.ndarray:
    return np.concatenate([embed, embed[bos_token_id : bos_token_id + 1]], axis=0)


def _gpt2_params(cfg: LMConfig, sd: dict, bos_token_id: int, dt) -> dict:
    g = lambda k: sd[k] if k in sd else sd["transformer." + k]
    d = cfg.d_model
    params = {
        "embed": _j(_with_bos_row(g("wte.weight"), bos_token_id), dt),
        "pos_embed": _j(g("wpe.weight")[: cfg.max_seq], dt),
        "final_norm": {"scale": _j(g("ln_f.weight"), dt), "bias": _j(g("ln_f.bias"), dt)},
        "layers": [],
    }
    for i in range(cfg.n_layers):
        p = lambda k: g(f"h.{i}.{k}")
        qkv_w = p("attn.c_attn.weight")  # Conv1D: [D, 3D]
        qkv_b = p("attn.c_attn.bias")
        layer = {
            "ln1": {"scale": _j(p("ln_1.weight"), dt), "bias": _j(p("ln_1.bias"), dt)},
            "ln2": {"scale": _j(p("ln_2.weight"), dt), "bias": _j(p("ln_2.bias"), dt)},
            "wq": _j(qkv_w[:, :d], dt),
            "wk": _j(qkv_w[:, d : 2 * d], dt),
            "wv": _j(qkv_w[:, 2 * d :], dt),
            "bq": _j(qkv_b[:d], dt),
            "bk": _j(qkv_b[d : 2 * d], dt),
            "bv": _j(qkv_b[2 * d :], dt),
            "wo": _j(p("attn.c_proj.weight"), dt),
            "bo": _j(p("attn.c_proj.bias"), dt),
            "w_up": _j(p("mlp.c_fc.weight"), dt),
            "b_up": _j(p("mlp.c_fc.bias"), dt),
            "w_down": _j(p("mlp.c_proj.weight"), dt),
            "b_down": _j(p("mlp.c_proj.bias"), dt),
        }
        params["layers"].append(layer)
    params["layers"] = stack_layers(params["layers"])
    return params


def _llama_params(cfg: LMConfig, sd: dict, bos_token_id: int, dt) -> dict:
    g = lambda k: sd[k] if k in sd else sd["model." + k]
    embed = g("embed_tokens.weight")
    params = {
        "embed": _j(_with_bos_row(embed, bos_token_id), dt),
        "final_norm": {"scale": _j(g("norm.weight"), dt)},
        "layers": [],
    }
    if not cfg.tie_embeddings:
        params["head"] = _j(np.asarray(sd["lm_head.weight"]).T, dt)
    for i in range(cfg.n_layers):
        p = lambda k: g(f"layers.{i}.{k}")
        layer = {
            "ln1": {"scale": _j(p("input_layernorm.weight"), dt)},
            "ln2": {"scale": _j(p("post_attention_layernorm.weight"), dt)},
            "wq": _j(np.asarray(p("self_attn.q_proj.weight")).T, dt),
            "wk": _j(np.asarray(p("self_attn.k_proj.weight")).T, dt),
            "wv": _j(np.asarray(p("self_attn.v_proj.weight")).T, dt),
            "wo": _j(np.asarray(p("self_attn.o_proj.weight")).T, dt),
            "w_gate": _j(np.asarray(p("mlp.gate_proj.weight")).T, dt),
            "w_up": _j(np.asarray(p("mlp.up_proj.weight")).T, dt),
            "w_down": _j(np.asarray(p("mlp.down_proj.weight")).T, dt),
        }
        params["layers"].append(layer)
    params["layers"] = stack_layers(params["layers"])
    return params


def load_hf_model(name_or_path: str, dtype=jnp.bfloat16):
    """Load a local HF checkpoint (directory or cached model id) into
    (LMConfig, params). Requires the files to exist locally — no downloads."""
    import transformers

    hf_cfg = transformers.AutoConfig.from_pretrained(name_or_path, local_files_only=True)
    cfg = config_from_hf(hf_cfg, dtype=dtype)
    model = transformers.AutoModelForCausalLM.from_pretrained(
        name_or_path, local_files_only=True, torch_dtype="float32"
    )
    bos = hf_cfg.bos_token_id
    if bos is None:
        bos = getattr(hf_cfg, "eos_token_id", 0) or 0
    params = params_from_hf_state_dict(cfg, model.state_dict(), bos)
    return cfg, params
