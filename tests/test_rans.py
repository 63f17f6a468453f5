"""rANS spec tests: NumPy round-trips, JAX-vs-NumPy bit-exactness, batched
lanes with ragged lengths, and cross-coder size sanity."""

import numpy as np
import pytest

from lac_tpu.coder.rans import encode_capacity, rans_decode_np, rans_encode_np
from lac_tpu.coder.vector import (
    rans_decode_init,
    rans_decode_scan,
    rans_decode_step,
    rans_encode_batch,
)
from lac_tpu.ops.quantize import cdf_from_freq_np, quantize_logits_np


def random_instance(rng, t_len, v, prob_bits, skew=3.0):
    """Random static distribution + message; returns (syms, cdf, cdf_lo, freq)."""
    logits = rng.normal(0, skew, size=v).astype(np.float32)
    freq_row = quantize_logits_np(logits, prob_bits)
    cdf = cdf_from_freq_np(freq_row)  # [V+1]
    p = freq_row / freq_row.sum()
    syms = rng.choice(v, size=t_len, p=p)
    cdf_lo = cdf[syms]
    freq = freq_row[syms]
    return syms, cdf, cdf_lo, freq


class TestNumpyRans:
    @pytest.mark.parametrize("v,pb", [(4, 8), (256, 16), (1000, 16), (5000, 24)])
    def test_roundtrip(self, v, pb):
        rng = np.random.default_rng(v)
        for t_len in [1, 2, 64, 500]:
            syms, cdf, cdf_lo, freq = random_instance(rng, t_len, v, pb)
            words = rans_encode_np(cdf_lo, freq, pb)
            assert len(words) <= encode_capacity(t_len)
            out = rans_decode_np(words, t_len, lambda t, o: cdf, pb)
            assert out == syms.tolist()

    def test_compression_near_entropy(self):
        rng = np.random.default_rng(0)
        t_len, v, pb = 20000, 256, 16
        syms, cdf, cdf_lo, freq = random_instance(rng, t_len, v, pb, skew=4.0)
        words = rans_encode_np(cdf_lo, freq, pb)
        ideal_bits = -np.sum(np.log2(freq / (1 << pb)))
        actual_bits = 32 * len(words)
        # within 0.2% + 64-bit state overhead of the model's entropy
        assert actual_bits <= ideal_bits * 1.002 + 64 + 32

    def test_worst_case_capacity(self):
        # adversarial: rarest symbol repeatedly (freq=1 => ~pb bits/symbol)
        pb = 16
        freq_row = np.ones(256, dtype=np.int64)
        freq_row[0] = (1 << pb) - 255
        cdf = cdf_from_freq_np(freq_row)
        t_len = 100
        syms = np.full(t_len, 255)
        words = rans_encode_np(cdf[syms], freq_row[syms], pb)
        assert len(words) <= encode_capacity(t_len)
        out = rans_decode_np(words, t_len, lambda t, o: cdf, pb)
        assert out == syms.tolist()


class TestVectorRans:
    def test_matches_numpy_bit_for_bit(self):
        rng = np.random.default_rng(42)
        b, t_len, v, pb = 7, 200, 256, 16
        cdf_los, freqs, lengths, np_words = [], [], [], []
        for i in range(b):
            length = int(rng.integers(1, t_len + 1))
            syms, cdf, cdf_lo, freq = random_instance(rng, length, v, pb)
            pad = t_len - length
            cdf_los.append(np.pad(cdf_lo, (0, pad)))
            freqs.append(np.pad(freq, (0, pad), constant_values=1))
            lengths.append(length)
            np_words.append(rans_encode_np(cdf_lo, freq, pb))
        words, nwords = rans_encode_batch(
            np.stack(cdf_los), np.stack(freqs), np.array(lengths), pb
        )
        words, nwords = np.asarray(words), np.asarray(nwords)
        for i in range(b):
            assert nwords[i] == len(np_words[i]), f"lane {i} word count"
            assert (words[i, : nwords[i]] == np_words[i]).all(), f"lane {i} bits"

    def test_batched_roundtrip_scan(self):
        rng = np.random.default_rng(3)
        b, t_len, v, pb = 5, 150, 64, 12
        all_syms, all_cdf_lo, all_freq, cdfs, lengths = [], [], [], [], []
        for i in range(b):
            length = int(rng.integers(1, t_len + 1))
            syms, cdf, cdf_lo, freq = random_instance(rng, length, v, pb)
            all_syms.append(np.pad(syms, (0, t_len - length)))
            all_cdf_lo.append(np.pad(cdf_lo, (0, t_len - length)))
            all_freq.append(np.pad(freq, (0, t_len - length), constant_values=1))
            cdfs.append(np.broadcast_to(cdf, (t_len, v + 1)))
            lengths.append(length)
        lengths = np.array(lengths)
        words, nwords = rans_encode_batch(
            np.stack(all_cdf_lo), np.stack(all_freq), lengths, pb
        )
        decoded = np.asarray(rans_decode_scan(words, np.stack(cdfs), lengths, pb))
        for i in range(b):
            assert (decoded[i, : lengths[i]] == all_syms[i][: lengths[i]]).all()

    def test_stepwise_decode_matches_scan(self):
        rng = np.random.default_rng(9)
        b, t_len, v, pb = 4, 60, 32, 10
        syms, cdf, cdf_lo, freq = random_instance(rng, t_len, v, pb)
        cdf_lo_b = np.tile(cdf_lo, (b, 1))
        freq_b = np.tile(freq, (b, 1))
        lengths = np.full(b, t_len)
        words, _ = rans_encode_batch(cdf_lo_b, freq_b, lengths, pb)
        state = rans_decode_init(words)
        cdf_b = np.tile(cdf, (b, 1))
        outs = []
        for t in range(t_len):
            sym, state = rans_decode_step(state, cdf_b, pb)
            outs.append(np.asarray(sym))
        decoded = np.stack(outs, axis=1)
        assert (decoded == syms[None, :]).all()

    def test_zero_length_lane(self):
        pb = 8
        cdf_lo = np.zeros((2, 4), dtype=np.int64)
        freq = np.full((2, 4), 64, dtype=np.int64)
        lengths = np.array([0, 4])
        words, nwords = rans_encode_batch(cdf_lo, freq, lengths, pb)
        assert nwords[0] == 2  # just the final state
