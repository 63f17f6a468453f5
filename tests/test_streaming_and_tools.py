"""Streaming (push-style) coder, base-N conversion, PPM, metrics tools,
container verification, and block-granular decode."""

import numpy as np
import pytest

from lac_tpu.coder import StreamingDecoder, StreamingEncoder, ac_encode
from lac_tpu.metrics import measure_compress, ngram_stats
from lac_tpu.models import AdaptiveOrder0, MarkovMix, PPM, Uniform
from lac_tpu.stream.container import verify_container
from lac_tpu.utils import bytes_to_digits, digits_to_bytes


def _rng(seed=0):
    return np.random.default_rng(seed)


class TestStreamingEncoder:
    def test_matches_one_shot_encoder(self):
        data = _rng(1).integers(0, 256, 500).tolist()
        payload_ref, nbits = ac_encode(data, AdaptiveOrder0(256))
        chunks = []
        enc = StreamingEncoder(AdaptiveOrder0(256), on_bytes=chunks.append)
        for s in data:
            enc.push(s)
        enc.finish()
        assert b"".join(chunks) == payload_ref

    def test_progress_callback_and_accounting(self):
        seen = []
        enc = StreamingEncoder(
            Uniform(10), on_progress=lambda n, bits, total: seen.append((n, total))
        )
        for d in [3, 1, 4, 1, 5, 9, 2, 6]:
            enc.push(d)
        enc.finish()
        assert len(seen) == 8
        # uniform base 10: total code length approaches n*log2(10)
        n, total = seen[-1]
        assert n == 8
        assert abs(total - 8 * np.log2(10)) < 2.0

    def test_push_after_finish_raises(self):
        enc = StreamingEncoder(Uniform(2))
        enc.push(1)
        enc.finish()
        with pytest.raises(RuntimeError):
            enc.push(0)


class TestStreamingDecoder:
    @pytest.mark.parametrize("feed", ["bytes", "bits", "oneshot"])
    def test_roundtrip_incremental(self, feed):
        data = _rng(2).integers(0, 256, 400).tolist()
        payload, _ = ac_encode(data, AdaptiveOrder0(256))
        dec = StreamingDecoder(AdaptiveOrder0(256))
        got = []
        if feed == "bytes":
            for i in range(len(payload)):
                got.extend(dec.push(payload[i : i + 1]))
        elif feed == "bits":
            for byte in payload:
                for k in range(8):
                    got.extend(dec.push_bit((byte >> (7 - k)) & 1))
        else:
            got.extend(dec.push(payload))
        got.extend(dec.finish(len(data)))
        assert got[: len(data)] == data

    def test_symbols_stream_out_before_payload_ends(self):
        """Prefix property: most symbols must be decodable from a prefix."""
        data = list(b"the quick brown fox jumps over the lazy dog " * 20)
        payload, _ = ac_encode(data, AdaptiveOrder0(256))
        dec = StreamingDecoder(AdaptiveOrder0(256))
        early = dec.push(payload[: len(payload) // 2])
        assert len(early) > len(data) // 4

    def test_on_symbol_callback(self):
        data = [7, 3, 7, 7, 1]
        payload, _ = ac_encode(data, Uniform(8))
        seen = []
        dec = StreamingDecoder(Uniform(8), on_symbol=seen.append)
        dec.push(payload)
        dec.finish(len(data))
        assert seen[: len(data)] == data


class TestBaseConversion:
    @pytest.mark.parametrize("base", [2, 3, 10, 255])
    def test_roundtrip(self, base):
        digits = _rng(base).integers(0, base, 200).tolist()
        payload, nbits = digits_to_bytes(digits, base)
        assert bytes_to_digits(payload, len(digits), base, nbits=nbits) == digits

    def test_ratio_near_entropy(self):
        digits = _rng(5).integers(0, 10, 3000).tolist()
        payload, nbits = digits_to_bytes(digits, 10)
        assert nbits <= 3000 * np.log2(10) + 64

    def test_rejects_bad_digit(self):
        with pytest.raises(ValueError):
            digits_to_bytes([0, 5], 4)


class TestPPM:
    def test_roundtrip(self):
        data = list(b"abracadabra abracadabra abracadabra")
        payload, nbits = ac_encode(data, PPM(256, order=3))
        from lac_tpu.coder import ac_decode

        assert ac_decode(payload, len(data), PPM(256, order=3), nbits=nbits) == data

    def test_beats_order0_on_structured_text(self):
        data = list((b"to be or not to be, that is the question. " * 30))
        p_ppm, _ = ac_encode(data, PPM(256, order=3))
        p_o0, _ = ac_encode(data, AdaptiveOrder0(256))
        assert len(p_ppm) < len(p_o0)

    def test_beats_markov_mix(self):
        data = list(b"the theme the theatre thesis then there " * 40)
        p_ppm, _ = ac_encode(data, PPM(256, order=3))
        p_mm, _ = ac_encode(data, MarkovMix(256, order=3))
        assert len(p_ppm) <= len(p_mm)

    def test_copy_is_independent(self):
        p = PPM(4, order=2)
        for s in [0, 1, 2, 1, 0]:
            p.accept(s)
        q = p.copy()
        q.accept(3)
        assert p.tables != q.tables or p.history != q.history


class TestMetricsTools:
    def test_ngram_stats_counts(self):
        st = ngram_stats(b"abab", 2)
        assert st["counts"][(97, 98)] == 2
        assert st["counts"][(98, 97)] == 1
        assert st["unique"] == 2

    def test_ngram_conditional_entropy(self):
        # deterministic alternation: order-2 conditional entropy ~ 0
        st = ngram_stats(b"ababababababababab", 2)
        assert st["conditional_entropy_bits"] < 0.1

    def test_measure_compress(self, capsys):
        data = bytes(_rng(6).integers(0, 4, 800, dtype=np.uint8) * 3)
        payload, stats = measure_compress(data, AdaptiveOrder0(256))
        assert stats["symbols"] == 800
        assert stats["payload_bytes"] == len(payload)
        # 4-symbol alphabet: near 2 bits/sym, far below 8
        assert stats["bits_per_symbol"] < 3.5


class TestContainerVerify:
    def _container(self):
        from lac_tpu.runtime.engine import compress_bytes

        data = bytes(_rng(7).integers(0, 64, 9000, dtype=np.uint8))
        return data, compress_bytes(data, model_id="order0", block_size=2048)

    def test_clean_container_verifies(self):
        _, c = self._container()
        rep = verify_container(c)
        assert rep["ok"] and rep["bad_blocks"] == []
        assert rep["n_blocks"] == 5
        assert rep["block_spans"][0] == (0, 2048)

    def test_corruption_localized_to_block(self):
        data, c = self._container()
        bad = bytearray(c)
        bad[-10] ^= 0xFF  # flip a bit inside the last block's payload
        rep = verify_container(bytes(bad))
        assert not rep["ok"]
        assert rep["bad_blocks"] == [4]

    def test_read_container_raises_on_corruption(self):
        from lac_tpu.stream.container import read_container

        _, c = self._container()
        bad = bytearray(c)
        bad[-10] ^= 0xFF
        with pytest.raises(ValueError, match="checksum"):
            read_container(bytes(bad))


class TestBlockRandomAccess:
    def test_turbo_selected_blocks(self):
        from lac_tpu.runtime.turbo import turbo_compress, turbo_decompress_blocks

        data = bytes(_rng(8).integers(0, 96, 5000, dtype=np.uint8))
        c = turbo_compress(data, block_size=1024)
        got = turbo_decompress_blocks(c, [3, 0])
        assert got[0] == data[3 * 1024 : 4 * 1024]
        assert got[1] == data[0:1024]

    def test_engine_decompress_blocks_rans64(self):
        from lac_tpu.runtime.engine import compress_bytes, decompress_blocks

        data = bytes(_rng(9).integers(0, 64, 7000, dtype=np.uint8))
        c = compress_bytes(data, model_id="order0", block_size=2048)
        got = decompress_blocks(c, [2, 0])
        assert got[0] == data[2 * 2048 : 3 * 2048]
        assert got[1] == data[0:2048]
