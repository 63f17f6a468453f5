"""Growing-cache schedule (cache_grow): the serial-attention traffic cut.

The cache starts one bucket wide and grows by a bucket at bucket
boundaries; the schedule is a pure function of (t_len, bucket) recorded in
the container, so encoder and decoder replay identical graphs. Old
containers (no ``cache_grow`` key / 0) use the legacy fixed-width path.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from lac_tpu.models.transformer import init_params, tiny_config
from lac_tpu.runtime import lm_engine as E
from lac_tpu.runtime.lm_api import lm_compress_bytes, lm_decompress_bytes

import jax


def _mk(det=False, seed=0):
    cfg = tiny_config(vocab=61, n_heads=4, n_kv_heads=2, max_seq=32, det8=det)
    return cfg, init_params(cfg, jax.random.PRNGKey(seed))


def test_grown_segments_schedule():
    assert E._grown_segments(24, 8) == [(0, 8, 8), (8, 8, 16), (16, 8, 24)]
    assert E._grown_segments(20, 8) == [(0, 8, 8), (8, 8, 16), (16, 4, 24)]
    assert E._grown_segments(5, 128) == [(0, 5, 128)]


@pytest.mark.parametrize("det", [False, True])
def test_engine_roundtrip_grown(det):
    cfg, params = _mk(det)
    rng = np.random.default_rng(3)
    b, t, pb = 4, 24, 12
    toks = rng.integers(0, cfg.vocab, (b, t)).astype(np.int32)
    lens = np.array([24, 24, 17, 9], dtype=np.int32)
    for j, n in enumerate(lens):
        toks[j, n:] = 0
    w, nw = E.lm_encode(cfg, params, toks, lens, pb, cache_grow=8)
    d = np.asarray(E.lm_decode(cfg, params, np.asarray(w), lens, pb, t, cache_grow=8))
    for j, n in enumerate(lens):
        assert (d[j, :n] == toks[j, :n]).all()


@pytest.mark.parametrize("det", [False, True])
def test_engine_roundtrip_grown_windowed(det):
    cfg, params = _mk(det, seed=1)
    rng = np.random.default_rng(4)
    b, t, pb = 3, 83, 12  # > max_seq 32 -> windowed with re-primes
    toks = rng.integers(0, cfg.vocab, (b, t)).astype(np.int32)
    lens = np.array([83, 60, 41], dtype=np.int32)
    for j, n in enumerate(lens):
        toks[j, n:] = 0
    w, nw = E.lm_encode_windowed(cfg, params, toks, lens, pb, overlap=2, cache_grow=8)
    d = np.asarray(E.lm_decode_windowed(
        cfg, params, np.asarray(w), lens, pb, t, overlap=2, cache_grow=8))
    for j, n in enumerate(lens):
        assert (d[j, :n] == toks[j, :n]).all()


def test_grown_encode_decodes_with_grown_schedule_only_contract():
    """The schedule is part of the bitstream CONTRACT: decode must replay
    the encoder's widths. (Bits may happen to coincide between schedules —
    masked cache columns contribute exact zeros — but that is never
    promised, hence the container records ``cache_grow``.) This pins the
    plumbing: a grown encode decodes exactly under the same bucket."""
    cfg, params = _mk()
    rng = np.random.default_rng(5)
    toks = rng.integers(0, cfg.vocab, (2, 24)).astype(np.int32)
    lens = np.full((2,), 24, np.int32)
    w8, _ = E.lm_encode(cfg, params, toks, lens, 12, cache_grow=8)
    d = np.asarray(E.lm_decode(cfg, params, np.asarray(w8), lens, 12, 24, cache_grow=8))
    assert (d == toks).all()


def test_api_roundtrip_default_growth_and_legacy():
    data = b"growing cache schedule " * 60
    c = lm_compress_bytes(data, model_ref="prng:tiny:0", block_tokens=96, lanes=4)
    from lac_tpu.stream.container import read_container

    header, _ = read_container(c)
    assert header.config["cache_grow"] == E.GROW_BUCKET
    assert lm_decompress_bytes(c) == data
    # explicit legacy containers round-trip through the fixed-width path
    c0 = lm_compress_bytes(data, model_ref="prng:tiny:0", block_tokens=96,
                           lanes=4, cache_grow=0)
    header0, _ = read_container(c0)
    assert header0.config["cache_grow"] == 0
    assert lm_decompress_bytes(c0) == data


def test_fingerprint_covers_cache_grow():
    """The schedule changes the float path's bits, so it must be inside the
    fingerprint gate: a decoder that does not understand the ``cache_grow``
    key recomputes the crc WITHOUT it and fails loudly instead of silently
    replaying the wrong widths. cache_grow=0 keeps the legacy value so old
    containers still validate."""
    cfg, params = _mk()
    f0 = E.lm_fingerprint(cfg, params, 12)
    assert E.lm_fingerprint(cfg, params, 12, cache_grow=0) == f0
    f128 = E.lm_fingerprint(cfg, params, 12, cache_grow=128)
    assert f128 != f0
    assert E.lm_fingerprint(cfg, params, 12, cache_grow=64) not in (f0, f128)

    from lac_tpu.stream.container import read_container

    data = b"fingerprint gates the schedule " * 30
    kw = dict(model_ref="prng:tiny:0", block_tokens=96, lanes=4)
    hg, _ = read_container(lm_compress_bytes(data, **kw))          # default grow
    h0, _ = read_container(lm_compress_bytes(data, cache_grow=0, **kw))
    assert hg.config["fingerprint"] != h0.config["fingerprint"]


def test_cache_grow_rejects_negative():
    cfg, params = _mk()
    toks = np.zeros((2, 8), np.int32)
    lens = np.full((2,), 8, np.int32)
    with pytest.raises(ValueError, match="cache_grow"):
        E.lm_encode(cfg, params, toks, lens, 12, cache_grow=-8)
    with pytest.raises(ValueError, match="cache_grow"):
        E.lm_decode_windowed(cfg, params, np.zeros((2, 10), np.uint32), lens,
                             12, 8, cache_grow=-1)
