"""Byte-LM training: make your own predictor for the LM coding path.

The reference consumes a pretrained llama.cpp checkpoint and ships none
(llama_compress.py:4 points at a local GGML file). This module closes the
loop inside the framework: train a byte-level transformer on a corpus with
the same `models.transformer` forward the coder uses (so train/serve skew is
zero by construction), save it, and reference it from containers as
``file:<path>``.

TPU mapping: one jitted update step (AdamW, causal LM loss, bf16 compute /
f32 optimizer state); batches are sampled by a host PRNG with a fixed seed
so runs are reproducible. For multi-chip, pass a mesh — params replicate
and the batch shards over ``data`` (the same §6 geometry the coder uses).
"""

from __future__ import annotations

import json

import numpy as np

import jax
import jax.numpy as jnp
import optax

from .models.transformer import LMConfig, forward, init_cache, init_params

__all__ = ["train_byte_lm", "save_checkpoint", "load_checkpoint", "lm_loss"]

f32 = jnp.float32


def lm_loss(cfg: LMConfig, params, tokens):
    """Mean causal cross-entropy (nats->bits handled by caller). tokens
    [B, S+1]: positions 0..S-1 predict 1..S. BOS handling matches the coding
    path: the model is primed with cfg.bos_id."""
    inp, tgt = tokens[:, :-1], tokens[:, 1:]
    cache = init_cache(cfg, tokens.shape[0])
    logits, _ = forward(cfg, params, inp, cache)
    logp = jax.nn.log_softmax(logits.astype(f32), axis=-1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def train_byte_lm(
    cfg: LMConfig,
    corpus: bytes,
    steps: int = 2000,
    batch: int = 32,
    seq: int = 256,
    lr: float = 3e-4,
    seed: int = 0,
    warmup: int = 100,
    log_every: int = 0,
    mesh=None,
):
    """Train from scratch on ``corpus``; returns (params, losses)."""
    if cfg.vocab < 256:
        raise ValueError("byte LM needs vocab >= 256")
    if seq + 1 > cfg.max_seq:
        raise ValueError("seq+1 exceeds model context")
    params = init_params(cfg, jax.random.PRNGKey(seed))
    warmup = min(warmup, max(1, steps // 10))
    sched = optax.warmup_cosine_decay_schedule(0.0, lr, warmup, steps, lr * 0.1)
    opt = optax.adamw(sched, b1=0.9, b2=0.95, weight_decay=0.01)
    # f32 master copy for stable accumulation; bf16 copy feeds the forward
    master = jax.tree.map(lambda x: x.astype(f32), params)
    opt_state = opt.init(master)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        master = jax.device_put(master, rep)

    @jax.jit
    def step_fn(master, opt_state, toks):
        def loss_of(m):
            p = jax.tree.map(lambda x: x.astype(cfg.dtype), m)
            return lm_loss(cfg, p, toks)

        loss, grads = jax.value_and_grad(loss_of)(master)
        updates, opt_state = opt.update(grads, opt_state, master)
        master = optax.apply_updates(master, updates)
        return master, opt_state, loss

    arr = np.frombuffer(corpus, dtype=np.uint8)
    if len(arr) < (seq + 1) * 2:
        raise ValueError("corpus too small")
    rng = np.random.default_rng(seed)
    losses = []
    for i in range(steps):
        starts = rng.integers(0, len(arr) - seq - 1, size=batch)
        toks = np.stack([arr[s : s + seq + 1] for s in starts]).astype(np.int32)
        toks_d = jnp.asarray(toks)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            toks_d = jax.device_put(toks_d, NamedSharding(mesh, P("data", None)))
        master, opt_state, loss = step_fn(master, opt_state, toks_d)
        if log_every and (i % log_every == 0 or i == steps - 1):
            l = float(loss)
            losses.append(l)
            print(f"step {i:6d}  loss {l:.4f}  ({l / np.log(2):.3f} bits/byte)",
                  flush=True)
    params = jax.tree.map(lambda x: x.astype(cfg.dtype), master)
    return params, losses


# --------------------------------------------------------------------------
# Checkpoint format: single .npz with flattened params + json'd config.
# Deliberately dependency-free (no orbax) so a checkpoint is one portable
# file addressable from containers as model_ref "file:<path>".
# --------------------------------------------------------------------------


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, list):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def save_checkpoint(path: str, cfg: LMConfig, params) -> None:
    flat = _flatten(params)
    # bf16 has no npz dtype; store as uint16 bit patterns with a marker
    packed = {}
    bf16_keys = []
    for k, v in flat.items():
        if v.dtype == jnp.bfloat16:
            packed[k] = v.view(np.uint16)
            bf16_keys.append(k)
        else:
            packed[k] = v
    meta = dict(
        vocab=cfg.vocab, d_model=cfg.d_model, n_layers=cfg.n_layers,
        n_heads=cfg.n_heads, n_kv_heads=cfg.n_kv_heads, d_ff=cfg.d_ff,
        max_seq=cfg.max_seq, pos_embedding=cfg.pos_embedding, norm=cfg.norm,
        act=cfg.act, use_bias=cfg.use_bias, tie_embeddings=cfg.tie_embeddings,
        rope_theta=cfg.rope_theta, norm_eps=cfg.norm_eps,
        dtype="bfloat16" if cfg.dtype == jnp.bfloat16 else "float32",
        bf16_keys=bf16_keys,
    )
    np.savez(path, __meta__=json.dumps(meta), **packed)


def load_checkpoint(path: str):
    """Returns (LMConfig, params)."""
    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["__meta__"]))
    bf16 = set(meta.pop("bf16_keys"))
    dtype = jnp.bfloat16 if meta.pop("dtype") == "bfloat16" else jnp.float32
    cfg = LMConfig(dtype=dtype, **meta)

    def restore(k):
        v = z[k]
        return jnp.asarray(v.view(jnp.bfloat16) if k in bf16 else v)

    # rebuild the nested structure init_params produces
    tree = {}
    for k in z.files:
        if k == "__meta__":
            continue
        parts = k.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = restore(k)

    def listify(node):
        if isinstance(node, dict):
            if node and all(x.isdigit() for x in node):
                return [listify(node[str(i)]) for i in range(len(node))]
            return {k: listify(v) for k, v in node.items()}
        return node

    return cfg, listify(tree)
