"""int8 weights (cfg.w8): the float path's W8A8 speed mode.

Lock-step coding at 1B+ scale is weights-HBM-bound (BASELINE.md: TinyLlama
streams ~2.2 GB of bf16 weights per step), so w8 stores every dense
projection as int8 + per-output-column f32 scales and runs the projections
on the MXU int8 path (activations quantized per row on the fly). The
quantized forward changes the bitstream — container-flagged and
fingerprint-gated like kv8; combinable with kv8 (disjoint routes)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lac_tpu.models.transformer import (ensure_w8, forward, init_cache,
                                        init_params, tiny_config)
from lac_tpu.runtime import lm_engine as E
from lac_tpu.runtime.lm_api import lm_compress_bytes, lm_decompress_bytes
from lac_tpu.stream.container import read_container


def _mk(seed=0, **kw):
    cfg = tiny_config(vocab=61, n_heads=4, n_kv_heads=2, max_seq=32, w8=True, **kw)
    return cfg, init_params(cfg, jax.random.PRNGKey(seed))


def test_engine_roundtrip_w8():
    cfg, params = _mk()
    rng = np.random.default_rng(1)
    b, t, pb = 4, 24, 12
    toks = rng.integers(0, cfg.vocab, (b, t)).astype(np.int32)
    lens = np.array([24, 24, 15, 7], dtype=np.int32)
    for j, n in enumerate(lens):
        toks[j, n:] = 0
    w, _ = E.lm_encode(cfg, params, toks, lens, pb)
    d = np.asarray(E.lm_decode(cfg, params, np.asarray(w), lens, pb, t))
    for j, n in enumerate(lens):
        assert (d[j, :n] == toks[j, :n]).all()


def test_engine_roundtrip_w8_kv8_grown_windowed():
    """The full speed stack: w8 + kv8 + growing cache + window re-priming."""
    cfg, params = _mk(seed=2, kv8=True)
    rng = np.random.default_rng(3)
    b, t, pb = 3, 83, 12  # > max_seq 32 -> windowed
    toks = rng.integers(0, cfg.vocab, (b, t)).astype(np.int32)
    lens = np.array([83, 52, 33], dtype=np.int32)
    for j, n in enumerate(lens):
        toks[j, n:] = 0
    w, _ = E.lm_encode_windowed(cfg, params, toks, lens, pb, overlap=2, cache_grow=8)
    d = np.asarray(E.lm_decode_windowed(
        cfg, params, np.asarray(w), lens, pb, t, overlap=2, cache_grow=8))
    for j, n in enumerate(lens):
        assert (d[j, :n] == toks[j, :n]).all()


def test_ensure_w8_idempotent_and_shapes():
    cfg, params = _mk(seed=5)
    q = ensure_w8(cfg, params)
    assert ensure_w8(cfg, q) is q
    wq, ws = q["layers"]["wq"]
    assert wq.dtype == jnp.int8 and ws.dtype == jnp.float32
    assert wq.shape == params["layers"]["wq"].shape
    assert ws.shape == (cfg.n_layers, 1, wq.shape[-1])
    hq, hs = q["head"]
    assert hq.dtype == jnp.int8 and hs.shape == (1, cfg.vocab)
    # float cfg: pass-through untouched
    cfgf = dataclasses.replace(cfg, w8=False)
    assert ensure_w8(cfgf, params) is params


def test_w8_tied_embeddings_head():
    cfg = tiny_config(vocab=61, n_heads=4, n_kv_heads=2, max_seq=32, w8=True,
                      tie_embeddings=True, pos_embedding="learned",
                      norm="layernorm", act="gelu", use_bias=True)
    params = init_params(cfg, jax.random.PRNGKey(7))
    rng = np.random.default_rng(8)
    b, t, pb = 2, 16, 12
    toks = rng.integers(0, cfg.vocab, (b, t)).astype(np.int32)
    lens = np.full((b,), t, np.int32)
    w, _ = E.lm_encode(cfg, params, toks, lens, pb)
    d = np.asarray(E.lm_decode(cfg, params, np.asarray(w), lens, pb, t))
    assert (d == toks).all()


def test_api_roundtrip_and_container_flag():
    data = b"int8 weight speed mode " * 50
    c = lm_compress_bytes(data, model_ref="prng:tiny:0", block_tokens=96,
                          lanes=4, w8=True)
    header, _ = read_container(c)
    assert header.config["w8"] is True
    assert lm_decompress_bytes(c) == data


def test_w8_changes_bits_and_fingerprint():
    data = b"quantized projections change the bitstream " * 20
    kw = dict(model_ref="prng:tiny:0", block_tokens=96, lanes=4)
    cf = lm_compress_bytes(data, **kw)
    c8 = lm_compress_bytes(data, w8=True, **kw)
    hf, _ = read_container(cf)
    h8, _ = read_container(c8)
    assert hf.config["fingerprint"] != h8.config["fingerprint"]
    assert lm_decompress_bytes(cf) == lm_decompress_bytes(c8) == data


def test_w8_det8_mutually_exclusive():
    with pytest.raises(ValueError, match="mutually exclusive"):
        lm_compress_bytes(b"x" * 10, model_ref="prng:tiny:0", det8=True, w8=True)
    with pytest.raises(ValueError, match="mutually exclusive"):
        tiny_config(vocab=61, det8=True, w8=True)


def test_w8_on_mesh():
    """w8 under a (data, model) mesh: float params shard first, then the
    on-device quantization runs under the placements (jit SPMD semantics
    keep the per-column maxima global, so the quantized values match the
    no-mesh tree; input-sharded projections reduce their max over ICI)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from lac_tpu.parallel.mesh import make_mesh

    data = (b"int8 weights on a TP mesh " * 60)[:1500]
    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    c = lm_compress_bytes(data, model_ref="prng:tiny:0", block_tokens=256,
                          lanes=4, w8=True, mesh=mesh)
    header, _ = read_container(c)
    assert header.config["w8"] is True
    assert lm_decompress_bytes(c) == data

    from lac_tpu.runtime.dist import (
        lm_compress_distributed,
        lm_decompress_distributed,
    )

    cd = lm_compress_distributed(data, model_ref="prng:tiny:0",
                                 block_tokens=256, lanes=4, w8=True, mesh=mesh)
    hd, _ = read_container(cd)
    assert hd.config["w8"] is True
    assert lm_decompress_distributed(cd, mesh=mesh) == data


def test_w8_quantization_stays_close_to_float():
    """Not a bit contract — a sanity bound that W8A8 stays a usable
    predictor (logits close to the float path's)."""
    cfg8, params = _mk(seed=4)
    cfgf = dataclasses.replace(cfg8, w8=False)
    rng = np.random.default_rng(5)
    toks = jnp.asarray(rng.integers(0, cfg8.vocab, (2, 16)).astype(np.int32))
    fwd = jax.jit(forward, static_argnums=(0,))

    def run(cfg):
        p = ensure_w8(cfg, params)
        cache = init_cache(cfg, 2, 16)
        outs = []
        for t in range(16):
            lg, cache = fwd(cfg, p, toks[:, t : t + 1], cache)
            outs.append(np.asarray(lg.astype(jnp.float32))[:, 0])
        return np.stack(outs, axis=1)

    l8, lf = run(cfg8), run(cfgf)
    assert np.abs(l8 - lf).max() < 0.35
    assert np.abs(l8 - lf).mean() < 0.04


def test_staged_init_matches_fused_structure():
    """init_params_w8 (the staged big-model init that bounds the bf16 ghost
    to one layer — the r4 8B B=96 OOM fix) produces the exact tree
    structure/shapes/dtypes of ensure_w8(init_params(...)) and codes
    round-trip, for both arch families."""
    from lac_tpu.models.transformer import init_params_w8
    from lac_tpu.runtime.lm_engine import lm_decode, lm_encode

    for kw in (
        dict(),
        dict(pos_embedding="learned", norm="layernorm", act="gelu",
             use_bias=True, tie_embeddings=True),
    ):
        cfg, params = _mk(seed=7, **kw)
        ref = ensure_w8(cfg, params)
        staged = init_params_w8(cfg, jax.random.PRNGKey(7))
        rs = jax.tree.map(lambda x: (x.shape, str(x.dtype)), ref)
        ss = jax.tree.map(lambda x: (x.shape, str(x.dtype)), staged)
        assert jax.tree_util.tree_structure(rs) == jax.tree_util.tree_structure(ss)
        assert jax.tree.leaves(rs) == jax.tree.leaves(ss)
        toks = np.random.default_rng(8).integers(0, cfg.vocab, (4, 16)).astype(np.int32)
        lens = np.full(4, 16, np.int32)
        w, _ = lm_encode(cfg, staged, toks, lens, 12)
        d = np.asarray(lm_decode(cfg, staged, np.asarray(w), lens, 12, 16))
        assert (d == toks).all()
