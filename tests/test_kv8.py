"""int8 KV cache (cfg.kv8): the float path's serving-style speed mode.

Lock-step decode reads the whole cache every step, so K/V bytes dominate
per-step HBM traffic; kv8 stores int8 rows + per-row f32 scales and runs
the cache-route contractions on the MXU int8 path. The quantized attention
changes the bitstream — the container records ``kv8`` and the behavioral
fingerprint gates a mismatched decoder, exactly like det8.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lac_tpu.models.transformer import forward, init_cache, init_params, tiny_config
from lac_tpu.runtime import lm_engine as E
from lac_tpu.runtime.lm_api import lm_compress_bytes, lm_decompress_bytes
from lac_tpu.stream.container import read_container


def _mk(seed=0, **kw):
    cfg = tiny_config(vocab=61, n_heads=4, n_kv_heads=2, max_seq=32, kv8=True, **kw)
    return cfg, init_params(cfg, jax.random.PRNGKey(seed))


def test_engine_roundtrip_kv8():
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


def test_engine_roundtrip_kv8_grown_windowed():
    """kv8 composes with the growing-cache schedule and window re-priming
    (the grow copy and the re-prime prefill both carry the 4-buffer cache)."""
    cfg, params = _mk(seed=2)
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


def test_api_roundtrip_and_container_flag():
    data = b"int8 kv cache speed mode " * 50
    c = lm_compress_bytes(data, model_ref="prng:tiny:0", block_tokens=96,
                          lanes=4, kv8=True)
    header, _ = read_container(c)
    assert header.config["kv8"] is True
    assert lm_decompress_bytes(c) == data


def test_kv8_changes_bits_and_fingerprint():
    data = b"quantized attention changes the bitstream " * 20
    kw = dict(model_ref="prng:tiny:0", block_tokens=96, lanes=4)
    cf = lm_compress_bytes(data, **kw)
    c8 = lm_compress_bytes(data, kv8=True, **kw)
    hf, _ = read_container(cf)
    h8, _ = read_container(c8)
    assert hf.config["fingerprint"] != h8.config["fingerprint"]
    assert lm_decompress_bytes(cf) == lm_decompress_bytes(c8) == data


def test_kv8_det8_mutually_exclusive():
    with pytest.raises(ValueError, match="mutually exclusive"):
        lm_compress_bytes(b"x" * 10, model_ref="prng:tiny:0", det8=True, kv8=True)
    # exclusivity is now enforced at config construction (covers w8 too)
    with pytest.raises(ValueError, match="mutually exclusive"):
        tiny_config(vocab=61, n_heads=4, n_kv_heads=2, max_seq=32,
                    kv8=True, det8=True)


def test_kv8_on_mesh_and_distributed_driver():
    """kv8 under a (data, model) mesh: the 4-buffer cache shards via
    cache_pspecs(kv8=True), the container carries both the mesh geometry
    and the kv8 flag, and the multi-host driver plumbs it end-to-end."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from lac_tpu.parallel.mesh import make_mesh
    from lac_tpu.runtime.dist import (
        lm_compress_distributed,
        lm_decompress_distributed,
    )
    from lac_tpu.stream.container import read_container

    data = (b"int8 cache on a TP mesh " * 70)[:1500]
    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    c = lm_compress_bytes(data, model_ref="prng:tiny:0", block_tokens=256,
                          lanes=4, kv8=True, mesh=mesh)
    header, _ = read_container(c)
    assert header.config["kv8"] is True
    assert header.config["mesh"] == {"data": 2, "model": 2}
    assert lm_decompress_bytes(c) == data  # mesh auto-reconstructed

    cd = lm_compress_distributed(data, model_ref="prng:tiny:0", block_tokens=256,
                                 lanes=4, kv8=True, mesh=mesh)
    hd, _ = read_container(cd)
    assert hd.config["kv8"] is True
    assert lm_decompress_distributed(cd, mesh=mesh) == data


def test_kv8_quantization_stays_close_to_float():
    """Not a bit contract — a sanity bound that the int8 attention stays a
    usable predictor (logits close to the float path's)."""
    cfg8, params = _mk(seed=4)
    import dataclasses

    cfgf = dataclasses.replace(cfg8, kv8=False)
    rng = np.random.default_rng(5)
    toks = jnp.asarray(rng.integers(0, cfg8.vocab, (2, 16)).astype(np.int32))
    fwd = jax.jit(forward, static_argnums=(0,))

    def run(cfg):
        cache = init_cache(cfg, 2, 16)
        outs = []
        for t in range(16):
            lg, cache = fwd(cfg, params, toks[:, t : t + 1], cache)
            outs.append(np.asarray(lg.astype(jnp.float32))[:, 0])
        return np.stack(outs, axis=1)

    l8, lf = run(cfg8), run(cfgf)
    # logits are O(1); int8 rows keep them within a few percent
    assert np.abs(l8 - lf).max() < 0.25
    assert np.abs(l8 - lf).mean() < 0.02
