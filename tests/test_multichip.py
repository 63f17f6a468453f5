"""TP+DP mesh coverage in the test suite (mirrors the driver's
__graft_entry__.dryrun_multichip): LM encode/decode over a (data, model)
mesh of 8 virtual CPU devices must round-trip, and TP-sharded single-chip
logits must match the unsharded ones closely enough to be a plausible
deployment (bit-identical is NOT promised across meshes — see
docs/DESIGN.md §6; encode/decode always share one mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from lac_tpu.models.transformer import forward, init_cache, init_params, tiny_config
from lac_tpu.parallel.mesh import make_mesh
from lac_tpu.parallel.shard import shard_params
from lac_tpu.runtime.lm_engine import lm_decode, lm_encode

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _setup(model_par: int):
    mesh = make_mesh(data=-1, model=model_par, devices=jax.devices()[:8])
    cfg = tiny_config(vocab=61, n_heads=4, n_kv_heads=2, max_seq=32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    return mesh, cfg, params


@pytest.mark.parametrize("model_par", [1, 2, 4])
def test_lm_roundtrip_on_mesh(model_par):
    mesh, cfg, params = _setup(model_par)
    sharded = shard_params(mesh, params)
    b, t_len, pb = 2 * (8 // model_par), 16, 12
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, cfg.vocab, (b, t_len)).astype(np.int32)
    lengths = np.full(b, t_len, dtype=np.int32)
    tokens_d = jax.device_put(tokens, NamedSharding(mesh, P("data", None)))
    lengths_d = jax.device_put(lengths, NamedSharding(mesh, P("data")))
    words, nwords = lm_encode(cfg, sharded, tokens_d, lengths_d, pb)
    decoded = np.asarray(
        lm_decode(cfg, sharded, np.asarray(words), lengths_d, pb, t_len)
    )
    assert (decoded == tokens).all()


@pytest.mark.parametrize("model_par", [1, 2])
def test_w8_roundtrip_on_mesh(model_par):
    """w8 params over the data x model mesh: hazard #5 lived at a program
    boundary (encoder vs decoder programs) the single-process tests did not
    cover, and the mesh is another such boundary — the sharded w8 dequant
    chain must produce the same CDFs in both engine programs (VERDICT r4
    item 5). Params are pre-quantized (ensure_w8) then sharded, the
    production order."""
    import dataclasses

    from lac_tpu.models.transformer import ensure_w8

    mesh, cfg, params = _setup(model_par)
    cfg = dataclasses.replace(cfg, w8=True)
    sharded = shard_params(mesh, ensure_w8(cfg, params))
    b, t_len, pb = 2 * (8 // model_par), 16, 12
    rng = np.random.default_rng(3)
    tokens = rng.integers(0, cfg.vocab, (b, t_len)).astype(np.int32)
    lengths = np.full(b, t_len, dtype=np.int32)
    tokens_d = jax.device_put(tokens, NamedSharding(mesh, P("data", None)))
    lengths_d = jax.device_put(lengths, NamedSharding(mesh, P("data")))
    words, nwords = lm_encode(cfg, sharded, tokens_d, lengths_d, pb)
    decoded = np.asarray(
        lm_decode(cfg, sharded, np.asarray(words), lengths_d, pb, t_len)
    )
    assert (decoded == tokens).all()


def test_container_mesh_metadata_roundtrip():
    """The container records the encode mesh; decode reconstructs it from
    local devices without the caller passing one (VERDICT round-1 item 4)."""
    from lac_tpu.runtime.lm_api import lm_compress_bytes, lm_decompress_bytes

    data = (b"mesh metadata determinism " * 60)[:1200]
    mesh = make_mesh(data=4, model=2, devices=jax.devices()[:8])
    c = lm_compress_bytes(data, model_ref="prng:tiny:0", block_tokens=256,
                          lanes=4, mesh=mesh)
    # auto-reconstruct from container metadata
    assert lm_decompress_bytes(c) == data
    # an explicitly wrong mesh fails early with a geometry error, not garbage
    wrong = make_mesh(data=8, model=1, devices=jax.devices()[:8])
    with pytest.raises(ValueError, match="encode mesh"):
        lm_decompress_bytes(c, mesh=wrong)
    # meshless containers refuse a meshed decode (CDFs are mesh-dependent)
    c2 = lm_compress_bytes(data, model_ref="prng:tiny:0", block_tokens=256, lanes=4)
    with pytest.raises(ValueError, match="without a mesh"):
        lm_decompress_bytes(c2, mesh=mesh)


def test_lm_distributed_driver_with_mesh():
    """Single-process span driver with a local TP mesh: container carries
    the mesh geometry and round-trips through the distributed decode path."""
    from lac_tpu.runtime.dist import lm_compress_distributed, lm_decompress_distributed
    from lac_tpu.stream.container import read_container

    data = (b"span driver over a mesh " * 80)[:1600]
    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    c = lm_compress_distributed(data, model_ref="prng:tiny:0", block_tokens=256,
                                lanes=4, mesh=mesh)
    header, _ = read_container(c)
    assert header.config["mesh"] == {"data": 2, "model": 2}
    assert lm_decompress_distributed(c, mesh=mesh) == data


_DET8_ARCHES = {
    # rmsnorm + silu_glu + rope (llama family) AND layernorm + gelu +
    # learned positions + biases (gpt2 family): every det8 branch
    # (_det_mean, det_gelu_tanh, bias adds) gets mesh-invariance coverage
    "llama": dict(),
    "gpt2": dict(pos_embedding="learned", norm="layernorm", act="gelu",
                 use_bias=True, n_kv_heads=4, tie_embeddings=True),
}


@pytest.mark.parametrize("model_par", [2, 4])
@pytest.mark.parametrize("arch", sorted(_DET8_ARCHES))
def test_det8_logits_bit_identical_across_meshes(model_par, arch):
    """cfg.det8: every order-sensitive reduction runs in int32, so the
    logits bits cannot depend on mesh geometry (SURVEY §2.5 hard part #6 —
    the guarantee the float path explicitly does NOT make above)."""
    mesh, _, _ = _setup(model_par)
    kw = dict(n_heads=4, n_kv_heads=2)
    kw.update(_DET8_ARCHES[arch])  # arch overrides (gpt2 needs MHA kv=4)
    cfg = tiny_config(vocab=61, max_seq=32, det8=True, **kw)
    params = init_params(cfg, jax.random.PRNGKey(0))
    sharded = shard_params(mesh, params)
    b = 8
    toks = jnp.asarray(np.random.default_rng(2).integers(0, cfg.vocab, (b, 4)))
    toks_d = jax.device_put(toks, NamedSharding(mesh, P("data", None)))
    logits_ref, _ = jax.jit(forward, static_argnums=0)(cfg, params, toks, init_cache(cfg, b))
    logits_m, _ = jax.jit(forward, static_argnums=0)(cfg, sharded, toks_d, init_cache(cfg, b))
    a = np.asarray(logits_ref).view(np.uint8)
    c = np.asarray(logits_m).view(np.uint8)
    assert (a == c).all(), "det8 logits bits moved across mesh geometries"


def test_det8_container_topology_free():
    """A det8 container carries the guarantee end-to-end: encode on one
    topology, decode on another, bytes identical either way — and the
    container BYTES themselves do not depend on the encode mesh."""
    from lac_tpu.runtime.lm_api import lm_compress_bytes, lm_decompress_bytes

    data = (b"topology-invariant integer reductions " * 40)[:1400]
    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    c_nomesh = lm_compress_bytes(data, model_ref="prng:tiny:0", block_tokens=256,
                                 lanes=4, det8=True)
    c_mesh = lm_compress_bytes(data, model_ref="prng:tiny:0", block_tokens=256,
                               lanes=4, mesh=mesh, det8=True)
    from lac_tpu.stream.container import read_container

    # identical payloads regardless of encode mesh (headers differ only in
    # the recorded — now advisory — mesh geometry)
    _, blocks_a = read_container(c_nomesh)
    _, blocks_b = read_container(c_mesh)
    assert [b.payload for b in blocks_a] == [b.payload for b in blocks_b]
    # meshless encode -> meshed decode, and meshed encode -> meshless decode
    assert lm_decompress_bytes(c_nomesh, mesh=mesh) == data
    assert lm_decompress_bytes(c_mesh) == data
    # a det8-resolved model against a non-det8 container fails with a
    # mode-mismatch error, not a confusing fingerprint error
    from lac_tpu.models.lm_registry import resolve_lm
    import dataclasses

    c_float = lm_compress_bytes(data, model_ref="prng:tiny:0", block_tokens=256,
                                lanes=4)
    cfg, params = resolve_lm("prng:tiny:0", None)
    with pytest.raises(ValueError, match="WITHOUT det8"):
        lm_decompress_bytes(
            c_float, model=(dataclasses.replace(cfg, det8=True), params))


def test_det8_distributed_driver():
    """det8 flows through the multi-host LM driver: the span-driver
    container equals the plain API's det8 container byte for byte, and
    distributed decode accepts any topology (no encode-mesh replay)."""
    from lac_tpu.runtime.dist import lm_compress_distributed, lm_decompress_distributed
    from lac_tpu.runtime.lm_api import lm_compress_bytes
    from lac_tpu.stream.container import read_container

    data = (b"det8 span driver " * 90)[:1500]
    c = lm_compress_distributed(data, model_ref="prng:tiny:0", block_tokens=256,
                                lanes=4, det8=True)
    header, _ = read_container(c)
    assert header.config["det8"] is True
    assert c == lm_compress_bytes(data, model_ref="prng:tiny:0", block_tokens=256,
                                  lanes=4, det8=True)
    assert lm_decompress_distributed(c) == data
    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    assert lm_decompress_distributed(c, mesh=mesh) == data


def test_tp_logits_close_to_unsharded():
    mesh, cfg, params = _setup(2)
    sharded = shard_params(mesh, params)
    b = 8
    toks = jnp.asarray(np.random.default_rng(2).integers(0, cfg.vocab, (b, 4)))
    logits_ref, _ = jax.jit(forward, static_argnums=0)(cfg, params, toks, init_cache(cfg, b))
    logits_tp, _ = jax.jit(forward, static_argnums=0)(cfg, sharded, toks, init_cache(cfg, b))
    np.testing.assert_allclose(
        np.asarray(logits_ref), np.asarray(logits_tp), rtol=2e-4, atol=2e-4
    )
