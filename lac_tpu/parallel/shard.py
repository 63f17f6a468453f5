"""Sharding rules for the transformer params/cache/engine state.

Megatron-style tensor parallelism over the ``model`` axis:

- attention q/k/v projections: output (head) dim sharded; wo: input sharded
  (the pair forms an all-reduce-once block — XLA inserts the psum);
- MLP up/gate: output dim sharded; down: input dim sharded (same pattern);
- embeddings, norms, head: replicated (byte-vocab heads are small; vocab
  sharding is a later optimization for 128K vocabs);
- KV cache: kv-head dim sharded over ``model``, lanes over ``data``;
- coding lanes (tokens, rANS states, word buffers): sharded over ``data``.

With these placements, sharding propagation under jit partitions every
matmul on the MXU-friendly dims and rides ICI for the two per-layer
all-reduces — the standard TP recipe.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["param_shardings", "shard_params", "cache_pspecs", "lane_pspec"]


def param_pspecs(params: dict) -> dict:
    """PartitionSpec tree matching models.transformer param trees.
    ``layers`` leaves are stacked ``[n_layers, ...]`` (scan-over-layers
    layout), so every layer spec carries a leading replicated axis."""

    def with_w8_scale(v, sp: P):
        """w8 leaves are ``(int8 q, f32 scale)`` tuples (ensure_w8); the
        scale keeps a size-1 dim over the contraction axis, which cannot
        shard — give it the same spec with size-1 axes replicated."""
        if not isinstance(v, tuple):
            return sp
        ss = P(*[a if v[1].shape[i] > 1 else None for i, a in enumerate(sp)])
        return (sp, ss)

    def layer_spec(layers: dict) -> dict:
        spec = {}
        for k, v in layers.items():
            if k in ("wq", "wk", "wv", "w_up", "w_gate"):
                spec[k] = with_w8_scale(v, P(None, None, "model"))
            elif k in ("wo", "w_down"):
                spec[k] = with_w8_scale(v, P(None, "model", None))
            elif k in ("bq", "bk", "bv", "b_up"):
                spec[k] = P(None, "model")
            else:  # norms, bo, b_down: replicated
                spec[k] = P()
        return spec

    spec: dict = {
        "embed": P(),
        "final_norm": {k: P() for k in params["final_norm"]},
        "layers": layer_spec(params["layers"]),
    }
    if "pos_embed" in params:
        spec["pos_embed"] = P()
    if "head" in params:
        spec["head"] = P()
    return spec


def param_shardings(mesh: Mesh, params: dict) -> dict:
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        param_pspecs(params),
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(mesh: Mesh, params: dict) -> dict:
    """Place a param tree onto the mesh with TP shardings."""
    return jax.device_put(params, param_shardings(mesh, params))


def cache_pspecs(n_layers: int, kv8: bool = False) -> dict:
    # stacked cache: k/v [L, B, W, KVH, Dh]; lanes over data, kv heads over
    # model (n_layers kept in the signature for call-site stability). kv8
    # adds the per-row scale buffers [L, B, W, KVH, 1], sharded the same.
    del n_layers
    kv = P(None, "data", None, "model", None)
    if kv8:
        return {"k": kv, "ks": kv, "v": kv, "vs": kv, "pos": P()}
    return {"k": kv, "v": kv, "pos": P()}


def lane_pspec() -> P:
    """Per-lane engine arrays ([B, ...]): sharded over data."""
    return P("data")
