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


def lm_loss(cfg: LMConfig, params, tokens, fused: bool = False,
            remat: bool = True, unroll: bool = False):
    """Mean causal cross-entropy (nats->bits handled by caller). tokens
    [B, S+1]: positions 0..S-1 predict 1..S. BOS handling matches the coding
    path: the model is primed with cfg.bos_id.

    ``fused=True`` routes the prefill attention through the flash kernel
    (training-only numerics; see ``transformer.forward``)."""
    inp, tgt = tokens[:, :-1], tokens[:, 1:]
    # size the cache to the training sequence, not cfg.max_seq: every score
    # row spans the cache width, so an oversized cache multiplies attention
    # HBM traffic (and at B>=128 wedges the remote compile)
    cache = init_cache(cfg, tokens.shape[0], window=inp.shape[1])
    logits, _ = forward(cfg, params, inp, cache, prefill=True, remat=remat,
                        unroll=unroll, fused=fused)
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
    eval_corpus: bytes | None = None,
    eval_every: int = 0,
    eval_batches: int = 8,
    save_best_path: str | None = None,
    save_max_seq: int | None = None,
    init: dict | None = None,
    fused_attn: bool = False,
):
    """Train from scratch on ``corpus``; returns (params, losses).

    ``init``: warm-start params (e.g. from ``load_checkpoint``) instead of a
    fresh init — continuation/fine-tune runs; shapes must match ``cfg``. The
    optimizer state starts fresh (the schedule re-warms over this run).

    Optional held-out tracking: with ``eval_corpus``/``eval_every`` set, the
    mean causal loss on deterministic held-out windows is computed every
    ``eval_every`` steps, and (if ``save_best_path``) the best-so-far params
    are checkpointed there — early stopping by construction: the returned
    params are the final step's, the saved file is the best eval. The saved
    config's ``max_seq`` is capped at ``save_max_seq`` (default: the
    training sequence length). RoPE positions past the training length
    degrade and then collapse — measured per-position held-out loss on a
    byte-12l/seq-512 run: 0.84 bits/byte in-distribution, 0.98 at
    1-1.5x train seq, 2.77 at 1.5-2x — and the windowed coder spends half
    its tokens in the top half of the window, so capping at train length
    is the measured ratio optimum (window 512: 1.01 bpb coding vs window
    768: 1.10 vs window 1024: 1.75 on the same data)."""
    if cfg.vocab < 256:
        raise ValueError("byte LM needs vocab >= 256")
    if seq + 1 > cfg.max_seq:
        raise ValueError("seq+1 exceeds model context")
    params = init if init is not None else init_params(cfg, jax.random.PRNGKey(seed))
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
            return lm_loss(cfg, p, toks, fused=fused_attn)

        loss, grads = jax.value_and_grad(loss_of)(master)
        updates, opt_state = opt.update(grads, opt_state, master)
        master = optax.apply_updates(master, updates)
        return master, opt_state, loss

    @jax.jit
    def eval_fn(master, toks):
        p = jax.tree.map(lambda x: x.astype(cfg.dtype), master)
        return lm_loss(cfg, p, toks, fused=fused_attn)

    def shard(toks_d):
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            return jax.device_put(toks_d, NamedSharding(mesh, P("data", None)))
        return toks_d

    eval_windows = None
    if eval_corpus is not None and eval_every:
        earr = np.frombuffer(eval_corpus, dtype=np.uint8)
        if len(earr) < seq + 1:
            raise ValueError(
                f"eval_corpus too small: {len(earr)} bytes < seq+1 = {seq + 1}"
            )
        # deterministic evenly-spaced windows over the held-out bytes
        n_win = eval_batches * batch
        stride = max(1, (len(earr) - seq - 1) // n_win)
        starts = (np.arange(n_win) * stride) % max(1, len(earr) - seq - 1)
        eval_windows = np.stack(
            [earr[s : s + seq + 1] for s in starts]
        ).astype(np.int32).reshape(eval_batches, batch, seq + 1)

    def run_eval(master):
        tot = 0.0
        for eb in eval_windows:
            tot += float(eval_fn(master, shard(jnp.asarray(eb))))
        return tot / len(eval_windows)

    arr = np.frombuffer(corpus, dtype=np.uint8)
    if len(arr) < (seq + 1) * 2:
        raise ValueError("corpus too small")
    rng = np.random.default_rng(seed)
    losses = []
    best_eval = float("inf")
    for i in range(steps):
        starts = rng.integers(0, len(arr) - seq - 1, size=batch)
        toks = np.stack([arr[s : s + seq + 1] for s in starts]).astype(np.int32)
        master, opt_state, loss = step_fn(master, opt_state, shard(jnp.asarray(toks)))
        if log_every and (i % log_every == 0 or i == steps - 1):
            l = float(loss)
            losses.append(l)
            print(f"step {i:6d}  loss {l:.4f}  ({l / np.log(2):.3f} bits/byte)",
                  flush=True)
        if eval_windows is not None and ((i + 1) % eval_every == 0 or i == steps - 1):
            ev = run_eval(master)
            marker = ""
            if ev < best_eval:
                best_eval = ev
                if save_best_path:
                    import dataclasses

                    cap = save_max_seq or min(cfg.max_seq, seq)
                    save_checkpoint(
                        save_best_path,
                        dataclasses.replace(cfg, max_seq=min(cfg.max_seq, cap)),
                        jax.tree.map(lambda x: x.astype(cfg.dtype), master),
                    )
                    marker = f" -> saved {save_best_path}"
            print(f"step {i:6d}  EVAL {ev:.4f}  ({ev / np.log(2):.3f} bits/byte)"
                  f"{marker}", flush=True)
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

    params = listify(tree)
    if isinstance(params.get("layers"), list):
        # pre-scan checkpoint format (per-layer "layers/<i>/..." entries):
        # stack into the [n_layers, ...] layout forward consumes
        from .models.transformer import stack_layers

        params["layers"] = stack_layers(params["layers"])
    return cfg, params
