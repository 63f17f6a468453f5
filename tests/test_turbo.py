"""Turbo engine (fused Pallas byte path, codec 2) end-to-end tests —
interpret mode on CPU; compiled on TPU by bench/verify."""

import numpy as np
import pytest

from lac_tpu.runtime.engine import compress_bytes, decompress_bytes
from lac_tpu.runtime.turbo import turbo_compress, turbo_decompress
from lac_tpu.stream.container import read_container


def _text(n: int) -> bytes:
    rng = np.random.default_rng(0)
    words = [b"turbo", b"entropy", b"kernel", b"vmem", b"lanes", b"shift"]
    out = bytearray()
    while len(out) < n:
        out += words[rng.integers(len(words))] + b" "
    return bytes(out[:n])


def test_roundtrip_exact():
    data = _text(10000)
    c = turbo_compress(data, block_size=1024)
    assert turbo_decompress(c) == data
    assert len(c) < len(data)


@pytest.mark.parametrize("n", [0, 1, 255, 1024, 1025, 5000])
def test_roundtrip_sizes(n):
    data = _text(n)
    c = turbo_compress(data, block_size=1024)
    assert turbo_decompress(c) == data


def test_engine_dispatch():
    data = _text(4000)
    c = compress_bytes(data, model_id="order0c", block_size=1024)
    header, _ = read_container(c)
    assert header.codec == 2 and header.model_id == "order0c"
    assert decompress_bytes(c) == data


def test_incompressible():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
    c = turbo_compress(data, block_size=1024)
    assert turbo_decompress(c) == data
    assert len(c) < len(data) * 1.05


@pytest.mark.parametrize("model", ["order0c", "order0n", "order1n", "order2n"])
def test_roundtrip_models(model):
    data = _text(8000)
    c = turbo_compress(data, block_size=1024, model=model)
    header, _ = read_container(c)
    assert header.model_id == model
    assert turbo_decompress(c) == data


def test_order0n_default_and_engine_dispatch():
    data = _text(4000)
    c = turbo_compress(data, block_size=1024)
    header, _ = read_container(c)
    assert header.model_id == "order0n"  # fast default
    c2 = compress_bytes(data, model_id="order0n", block_size=1024)
    assert decompress_bytes(c2) == data


@pytest.mark.parametrize("model", ["order0n", "order1n"])
def test_nibble_huge_block_falls_back_to_order0c(model):
    """Blocks too large for the fused nibble decode kernels' VMEM budget
    must silently use the chunked-decode codec instead of failing at
    decode."""
    data = _text(40000)
    c = turbo_compress(data, block_size=16384, model=model)
    header, _ = read_container(c)
    assert header.model_id == "order0c"
    assert turbo_decompress(c) == data


@pytest.mark.parametrize("model", ["order0n", "order1n", "order2n"])
def test_nibble_incompressible(model):
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
    c = turbo_compress(data, block_size=1024, model=model)
    assert turbo_decompress(c) == data
    assert len(c) < len(data) * 1.05


def test_order2n_block4096_roundtrip():
    """order2n's design point: block 4096 (64 lo-contexts need the longer
    adaptation run; the decode runs narrowed 1024-lane sub-kernels there).
    Must stay order2n (no geometry fallback) and round-trip."""
    data = _text(3 * 4096 + 517)
    c = turbo_compress(data, block_size=4096, model="order2n")
    header, _ = read_container(c)
    assert header.model_id == "order2n"
    assert turbo_decompress(c) == data


def test_order2n_huge_block_falls_back():
    data = _text(70000)
    c = turbo_compress(data, block_size=65536, model="order2n")
    header, _ = read_container(c)
    assert header.model_id == "order0c"
    assert turbo_decompress(c) == data


def test_codec_fuzz_cross_implementation():
    """Randomized cross-codec sweep: mixed-entropy payloads with ragged
    tails through every turbo codec; Pallas and native containers must be
    byte-identical and both must round-trip."""
    from lac_tpu.native.host import native_available, native_compress

    rng = np.random.default_rng(17)
    chunks = [
        rng.integers(0, 256, 3000, dtype=np.uint8).tobytes(),   # incompressible
        bytes(rng.integers(97, 102, 5000, dtype=np.uint8)),      # low entropy
        _text(2500),                                             # word-ish text
        b"\x00" * 1500,                                          # degenerate
    ]
    data = b"".join(chunks)[: 11801]  # ragged final block
    for model in ("order0n", "order1n", "order2n", "order0c"):
        c = turbo_compress(data, block_size=1024, model=model)
        assert turbo_decompress(c) == data, model
        if native_available():
            assert native_compress(data, block_size=1024, model=model) == c, model
