"""LM file API: container round-trips with self-contained prng models,
fingerprint enforcement, windowed blocks."""

import numpy as np
import pytest

from lac_tpu.models.lm_registry import resolve_lm
from lac_tpu.runtime.lm_api import lm_compress_bytes, lm_decompress_bytes
from lac_tpu.stream.container import read_container


def _text(n: int) -> bytes:
    rng = np.random.default_rng(0)
    words = [b"model", b"stream", b"window", b"tokens", b"fingerprint"]
    out = bytearray()
    while len(out) < n:
        out += words[rng.integers(len(words))] + b" "
    return bytes(out[:n])


MODEL = resolve_lm("prng:tiny:0", max_seq=64)


def test_roundtrip_small():
    data = _text(900)
    c = lm_compress_bytes(
        data, "prng:tiny:0", block_tokens=64, lanes=4, max_seq=64, model=MODEL
    )
    assert lm_decompress_bytes(c, model=MODEL) == data


def test_roundtrip_windowed_blocks():
    """block_tokens > max_seq exercises the sliding-window re-prime."""
    data = _text(700)
    c = lm_compress_bytes(
        data, "prng:tiny:0", block_tokens=160, lanes=4, max_seq=64, model=MODEL
    )
    header, blocks = read_container(c)
    assert header.config["block_tokens"] == 160
    assert lm_decompress_bytes(c, model=MODEL) == data


def test_self_contained_decode():
    """Decode must work from container metadata alone (model re-resolved
    from the prng ref)."""
    data = _text(300)
    c = lm_compress_bytes(
        data, "prng:tiny:0", block_tokens=64, lanes=4, max_seq=64, model=MODEL
    )
    assert lm_decompress_bytes(c) == data


def test_fingerprint_mismatch_rejected():
    data = _text(200)
    c = lm_compress_bytes(
        data, "prng:tiny:0", block_tokens=64, lanes=4, max_seq=64, model=MODEL
    )
    wrong = resolve_lm("prng:tiny:7", max_seq=64)
    with pytest.raises(ValueError, match="fingerprint"):
        lm_decompress_bytes(c, model=wrong)


def test_tiny_edge_sizes():
    for n in [0, 1, 63, 64, 65]:
        data = _text(n)
        c = lm_compress_bytes(
            data, "prng:tiny:0", block_tokens=64, lanes=4, max_seq=64, model=MODEL
        )
        assert lm_decompress_bytes(c, model=MODEL) == data
