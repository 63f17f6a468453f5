"""End-to-end engine tests: file bytes -> container -> file bytes, and
scan-model vs oracle-model agreement."""

import numpy as np
import pytest

from lac_tpu.models.classical import AdaptiveOrder0
from lac_tpu.models.functional import MarkovScan, Order0Scan
from lac_tpu.runtime.engine import compress_bytes, decode_lanes, decompress_bytes, encode_lanes
from lac_tpu.stream.container import read_container


def _sample_text(n: int) -> bytes:
    rng = np.random.default_rng(0)
    words = [b"the", b"quick", b"entropy", b"coder", b"tpu", b"lossless", b"jax"]
    out = bytearray()
    while len(out) < n:
        out += words[rng.integers(len(words))] + b" "
    return bytes(out[:n])


@pytest.mark.parametrize("model_id", ["order0", "markov1"])
def test_compress_roundtrip(model_id):
    data = _sample_text(10000)
    c = compress_bytes(data, model_id=model_id, block_size=4096)
    assert decompress_bytes(c) == data
    assert len(c) < len(data)  # text must actually compress


def test_compress_roundtrip_ragged_and_tiny():
    for n in [0, 1, 2, 4095, 4096, 4097]:
        data = _sample_text(n)
        c = compress_bytes(data, block_size=4096)
        assert decompress_bytes(c) == data


def test_incompressible_data_bounded_expansion():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, size=20000, dtype=np.uint8).tobytes()
    c = compress_bytes(data, block_size=8192)
    assert decompress_bytes(c) == data
    assert len(c) < len(data) * 1.05  # near-random bytes: small overhead only


def test_container_metadata():
    data = _sample_text(5000)
    c = compress_bytes(data, model_id="order0", block_size=2048)
    header, blocks = read_container(c)
    assert header.model_id == "order0"
    assert header.original_len == 5000
    assert len(blocks) == 3
    assert [b.raw_len for b in blocks] == [2048, 2048, 904]


def test_corrupt_container_detected():
    data = _sample_text(3000)
    c = bytearray(compress_bytes(data, block_size=2048))
    c[-10] ^= 0xFF  # flip a payload byte
    with pytest.raises(ValueError, match="checksum"):
        decompress_bytes(bytes(c))


def test_scan_model_matches_oracle_sizes():
    """The scan order-0 model and the oracle AdaptiveOrder0 implement the
    same counts+1 model: their per-position distributions must match, so
    their compressed sizes should be within a few % of each other."""
    from lac_tpu.coder.reference import ac_encode

    data = _sample_text(4000)
    c = compress_bytes(data, model_id="order0", block_size=4096)
    _, blocks = read_container(c)
    rans_bits = 8 * sum(len(b.payload) for b in blocks)
    _, ac_bits = ac_encode(data, AdaptiveOrder0(256))
    assert abs(rans_bits - ac_bits) / ac_bits < 0.03


def test_order0_scan_cdf_matches_oracle_cdf():
    """Bit-level agreement of the model layer: the functional model's CDF
    after a symbol sequence equals the oracle model's rescaled CDF under the
    closed-form guard."""
    import jax

    with jax.enable_x64(True):
        model = Order0Scan(vocab=8, prob_bits=12)
        state = model.init_state(1)
        seq = [3, 3, 1, 0, 7, 3]
        for s in seq:
            state = model.update(state, np.array([s], dtype=np.int32))
        cdf = np.asarray(model.cdf(state))[0]
    # oracle counts
    counts = np.zeros(8, dtype=np.int64)
    for s in seq:
        counts[s] += 1
    freq = counts + 1
    cum = np.concatenate([[0], np.cumsum(freq)])
    denom, v = 1 << 12, 8
    expect = (cum * (denom - v)) // cum[-1] + np.arange(v + 1)
    assert (cdf == expect).all()


def test_cli_roundtrip(tmp_path):
    from lac_tpu.cli import main

    src = tmp_path / "data.txt"
    src.write_bytes(_sample_text(6000))
    dst = tmp_path / "data.lac"
    out = tmp_path / "data.out"
    assert main(["compress", str(src), "-o", str(dst), "--block-size", "2048"]) == 0
    assert main(["info", str(dst)]) == 0
    assert main(["decompress", str(dst), "-o", str(out)]) == 0
    assert out.read_bytes() == src.read_bytes()


def test_order0nib_generic_lanes_roundtrip():
    """The composed nibble CDF is a valid generic-coder CDF: the XLA-scan
    rANS-64/32 path (engine lanes) round-trips it without the fused
    kernels."""
    from lac_tpu.models.functional import Order0NibCDF

    rng = np.random.default_rng(5)
    model = Order0NibCDF(vocab=256, prob_bits=16, rate=4)
    b, t = 3, 96
    syms = rng.integers(0, 256, (b, t)).astype(np.int32)
    lengths = np.array([t, 1, t // 2], dtype=np.int32)
    words, nwords = encode_lanes(syms, lengths, model)
    out = np.asarray(decode_lanes(np.asarray(words), lengths, model, t))
    for i in range(b):
        assert (out[i, : lengths[i]] == syms[i, : lengths[i]]).all()
