"""Pallas byte-path kernels vs the NumPy rANS-32/16 spec and the functional
shift-to-target model — run in interpret mode on CPU; the same code compiles
on TPU (exercised by bench/verify)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lac_tpu.coder.rans import rans32_decode_np, rans32_encode_np
from lac_tpu.models.functional import (
    CDF_STATE_BITS,
    adaptive_rate,
    cdf_state_init,
    cdf_state_to_coder,
    cdf_state_update,
)
from lac_tpu.ops.pallas_rans import (
    compact_words,
    o0c_encode_intervals,
    o0c_rans32_decode,
    rans32_encode_dense,
)

V, PB, RATE = 256, 16, 4


def ref_intervals(syms_row):
    """Oracle (lo, freq) per position from the functional model, batch 1."""
    state = cdf_state_init(1, V)
    los, frs = [], []
    for t, s in enumerate(syms_row):
        cdf = np.asarray(cdf_state_to_coder(state, PB, V))[0]
        los.append(int(cdf[s]))
        frs.append(int(cdf[s + 1]) - int(cdf[s]))
        state = cdf_state_update(
            state, jnp.asarray([int(s)], dtype=jnp.int32), adaptive_rate(RATE, t), V
        )
    return np.array(los), np.array(frs)


class TestIntervalKernel:
    def test_matches_functional_model(self):
        rng = np.random.default_rng(0)
        b, t_len = 4, 256
        syms = rng.integers(0, V, (t_len, b)).astype(np.int32)
        lo, fr = o0c_encode_intervals(jnp.asarray(syms), V, PB, RATE)
        lo, fr = np.asarray(lo), np.asarray(fr)
        for lane in range(b):
            rl, rf = ref_intervals(syms[:, lane])
            assert (lo[:, lane] == rl).all(), f"lane {lane} lo"
            assert (fr[:, lane] == rf).all(), f"lane {lane} freq"


class TestEncodeKernel:
    def test_bitstream_matches_numpy_spec(self):
        rng = np.random.default_rng(1)
        b, t_len = 4, 256
        lengths = np.array([256, 3, 100, 256], dtype=np.int32)
        syms = rng.integers(0, V, (t_len, b)).astype(np.int32)
        lo, fr = o0c_encode_intervals(jnp.asarray(syms), V, PB, RATE)
        dense, xfin = rans32_encode_dense(lo, fr, jnp.asarray(lengths)[None, :], PB)
        words, nwords = compact_words(dense, xfin, t_len + 2)
        words, nwords = np.asarray(words), np.asarray(nwords)
        lo, fr = np.asarray(lo), np.asarray(fr)
        for lane in range(b):
            n = lengths[lane]
            ref = rans32_encode_np(lo[:n, lane], fr[:n, lane], PB)
            assert nwords[lane] == len(ref), f"lane {lane} nwords"
            assert (words[lane, : len(ref)] == ref.astype(np.uint32)).all(), f"lane {lane}"


class TestFusedDecode:
    @pytest.mark.parametrize("pattern", ["random", "skewed"])
    def test_roundtrip(self, pattern):
        rng = np.random.default_rng(2)
        b, t_len = 4, 256
        lengths = np.array([256, 1, 137, 256], dtype=np.int32)
        if pattern == "random":
            syms = rng.integers(0, V, (t_len, b)).astype(np.int32)
        else:
            syms = (rng.integers(0, 4, (t_len, b)) * 17).astype(np.int32)
        lo, fr = o0c_encode_intervals(jnp.asarray(syms), V, PB, RATE)
        dense, xfin = rans32_encode_dense(lo, fr, jnp.asarray(lengths)[None, :], PB)
        words, nwords = compact_words(dense, xfin, t_len + 2)
        decoded = np.asarray(
            o0c_rans32_decode(words, jnp.asarray(lengths), t_len, V, PB, RATE)
        )
        for lane in range(b):
            n = lengths[lane]
            assert (decoded[:n, lane] == syms[:n, lane]).all(), f"lane {lane}"

    def test_decode_matches_numpy_spec_decoder(self):
        """The fused kernel must agree with the NumPy spec decoder driven by
        the same model — validates coder/model interleaving, not just
        inverse-of-our-own-encoder."""
        rng = np.random.default_rng(3)
        t_len = 128
        syms = rng.integers(0, V, (t_len, 1)).astype(np.int32)
        lo, fr = o0c_encode_intervals(jnp.asarray(syms), V, PB, RATE)
        dense, xfin = rans32_encode_dense(
            lo, fr, jnp.asarray(np.array([[t_len]], np.int32)), PB
        )
        words, nwords = compact_words(dense, xfin, t_len + 2)
        state_holder = {"state": cdf_state_init(1, V)}

        def cdf_provider(t, out):
            if t > 0:
                state_holder["state"] = cdf_state_update(
                    state_holder["state"],
                    jnp.asarray([out[-1]], dtype=jnp.int32),
                    adaptive_rate(RATE, t - 1), V,
                )
            return np.asarray(cdf_state_to_coder(state_holder["state"], PB, V))[0]

        ref = rans32_decode_np(np.asarray(words)[0], t_len, cdf_provider, PB)
        assert ref == list(syms[:, 0])


class TestOrder0Nib:
    """Codec 3: nibble-factorized model kernels vs the functional spec
    (models.functional.Order0NibCDF) and the NumPy rANS-32/16 decoder."""

    def _syms(self, b=4, t_len=256, seed=7):
        rng = np.random.default_rng(seed)
        syms = rng.integers(0, V, (t_len, b)).astype(np.int32)
        syms[:, 0] = (rng.integers(0, 4, t_len) * 17 + 64) & 0xFF  # skewed lane
        return syms

    def test_intervals_match_functional_model(self):
        from lac_tpu.models.functional import Order0NibCDF
        from lac_tpu.ops.pallas_rans import o0n_encode_intervals

        b, t_len = 4, 256
        syms = self._syms(b, t_len)
        m = Order0NibCDF(vocab=256, prob_bits=16, rate=RATE)
        cdf_j = jax.jit(m.cdf)
        upd_j = jax.jit(m.update)
        lo, fr = o0n_encode_intervals(jnp.asarray(syms), RATE)
        lo, fr = np.asarray(lo), np.asarray(fr)
        st = m.init_state(b)
        lanes = np.arange(b)
        for t in range(t_len):
            cdf = np.asarray(cdf_j(st))
            s = syms[t]
            assert (lo[t] == cdf[lanes, s]).all(), t
            assert (fr[t] == cdf[lanes, s + 1] - cdf[lanes, s]).all(), t
            st = upd_j(st, jnp.asarray(s))

    def test_composed_bitstream_matches_numpy_spec(self):
        from lac_tpu.ops.pallas_rans import o0n_encode_fused

        b, t_len = 4, 256
        lengths = np.array([256, 3, 100, 256], dtype=np.int32)
        syms = self._syms(b, t_len, seed=8)
        from lac_tpu.ops.pallas_rans import o0n_encode_intervals

        lo, fr = o0n_encode_intervals(jnp.asarray(syms), RATE)
        lo, fr = np.asarray(lo), np.asarray(fr)
        words, nwords = o0n_encode_fused(
            jnp.asarray(syms), jnp.asarray(lengths)[None, :], RATE, t_len + 2
        )
        words, nwords = np.asarray(words), np.asarray(nwords)
        for lane in range(b):
            n = lengths[lane]
            ref = rans32_encode_np(lo[:n, lane], fr[:n, lane], PB)
            assert nwords[lane] == len(ref), f"lane {lane}"
            assert (words[lane, : len(ref)] == ref.astype(np.uint16)).all(), f"lane {lane}"

    def test_fused_decode_roundtrip(self):
        from lac_tpu.ops.pallas_rans import o0n_encode_fused, o0n_rans32_decode

        b, t_len = 4, 256
        lengths = np.array([256, 1, 137, 256], dtype=np.int32)
        syms = self._syms(b, t_len, seed=9)
        words, nwords = o0n_encode_fused(
            jnp.asarray(syms), jnp.asarray(lengths)[None, :], RATE, t_len + 2
        )
        decoded = np.asarray(
            o0n_rans32_decode(jnp.asarray(words), jnp.asarray(lengths), t_len, RATE)
        )
        for lane in range(b):
            n = lengths[lane]
            assert (decoded[:n, lane] == syms[:n, lane]).all(), f"lane {lane}"

    def test_decode_matches_numpy_spec_decoder(self):
        """Fused o0n decode vs the NumPy spec decoder driven by the
        functional model — validates composition against the generic coder,
        not just inverse-of-our-own-encoder."""
        from lac_tpu.models.functional import Order0NibCDF
        from lac_tpu.ops.pallas_rans import o0n_encode_fused

        t_len = 128
        syms = self._syms(1, t_len, seed=10)
        words, _ = o0n_encode_fused(
            jnp.asarray(syms), jnp.asarray(np.array([[t_len]], np.int32)), RATE,
            t_len + 2,
        )
        m = Order0NibCDF(vocab=256, prob_bits=16, rate=RATE)
        cdf_j = jax.jit(m.cdf)
        upd_j = jax.jit(m.update)
        holder = {"st": m.init_state(1)}

        def cdf_provider(t, out):
            if t > 0:
                holder["st"] = upd_j(holder["st"], jnp.asarray([out[-1]], jnp.int32))
            return np.asarray(cdf_j(holder["st"]))[0]

        ref = rans32_decode_np(np.asarray(words)[0], t_len, cdf_provider, PB)
        assert ref == list(syms[:, 0])


class TestOrder2Nib:
    """Codec "order2n": hi | prev_h, lo | (h, prev_h >> 2) — 64 lo
    contexts. Spec holder is models.functional.Order2NibCDF; kernels must
    match it bit-for-bit and round-trip through the shared rANS-32/16
    layer (the 64-row table also exercises the generic tree-select and the
    narrowed sub-kernel lane splitting)."""

    def test_intervals_and_roundtrip(self):
        from lac_tpu.models.functional import Order2NibCDF
        from lac_tpu.ops.pallas_rans import (
            o2n_encode_fused,
            o2n_encode_intervals,
            o2n_rans32_decode,
        )

        rng = np.random.default_rng(13)
        b, t_len = 4, 192
        syms = rng.integers(0, V, (t_len, b)).astype(np.int32)
        syms[:, 0] = (rng.integers(0, 4, t_len) * 16 + rng.integers(0, 4, t_len)) & 0xFF
        m = Order2NibCDF(vocab=256, prob_bits=16, rate=RATE)
        cdf_j = jax.jit(m.cdf)
        upd_j = jax.jit(m.update)
        lo, fr = o2n_encode_intervals(jnp.asarray(syms), RATE)
        lo, fr = np.asarray(lo), np.asarray(fr)
        st = m.init_state(b)
        lanes = np.arange(b)
        for t in range(t_len):
            cdf = np.asarray(cdf_j(st))
            s = syms[t]
            assert (lo[t] == cdf[lanes, s]).all(), t
            assert (fr[t] == cdf[lanes, s + 1] - cdf[lanes, s]).all(), t
            st = upd_j(st, jnp.asarray(s))
        lengths = np.array([192, 1, 100, 192], dtype=np.int32)
        words, nwords = o2n_encode_fused(
            jnp.asarray(syms), jnp.asarray(lengths)[None, :], RATE, t_len + 2
        )
        # bitstream matches the generic numpy spec encoder
        for lane in range(b):
            n = lengths[lane]
            ref = rans32_encode_np(lo[:n, lane], fr[:n, lane], PB)
            assert np.asarray(nwords)[lane] == len(ref)
            assert (np.asarray(words)[lane, : len(ref)] == ref.astype(np.uint16)).all()
        decoded = np.asarray(
            o2n_rans32_decode(jnp.asarray(np.asarray(words)), jnp.asarray(lengths), t_len, RATE)
        )
        for lane in range(b):
            n = lengths[lane]
            assert (decoded[:n, lane] == syms[:n, lane]).all(), f"lane {lane}"


class TestOrder1Nib:
    """Codec "order1n": prev-h-conditioned hi table. Spec holder is
    models.functional.Order1NibCDF; kernels must match it bit-for-bit and
    round-trip through the shared rANS-32/16 layer."""

    def test_intervals_and_roundtrip(self):
        from lac_tpu.models.functional import Order1NibCDF
        from lac_tpu.ops.pallas_rans import (
            o1n_encode_fused,
            o1n_encode_intervals,
            o1n_rans32_decode,
        )

        rng = np.random.default_rng(11)
        b, t_len = 4, 192
        syms = rng.integers(0, V, (t_len, b)).astype(np.int32)
        syms[:, 0] = (rng.integers(0, 4, t_len) * 16 + rng.integers(0, 4, t_len)) & 0xFF
        m = Order1NibCDF(vocab=256, prob_bits=16, rate=RATE)
        cdf_j = jax.jit(m.cdf)
        upd_j = jax.jit(m.update)
        lo, fr = o1n_encode_intervals(jnp.asarray(syms), RATE)
        lo, fr = np.asarray(lo), np.asarray(fr)
        st = m.init_state(b)
        lanes = np.arange(b)
        for t in range(t_len):
            cdf = np.asarray(cdf_j(st))
            s = syms[t]
            assert (lo[t] == cdf[lanes, s]).all(), t
            assert (fr[t] == cdf[lanes, s + 1] - cdf[lanes, s]).all(), t
            st = upd_j(st, jnp.asarray(s))
        lengths = np.array([192, 1, 100, 192], dtype=np.int32)
        words, nwords = o1n_encode_fused(
            jnp.asarray(syms), jnp.asarray(lengths)[None, :], RATE, t_len + 2
        )
        # bitstream matches the generic numpy spec encoder
        for lane in range(b):
            n = lengths[lane]
            ref = rans32_encode_np(lo[:n, lane], fr[:n, lane], PB)
            assert np.asarray(nwords)[lane] == len(ref)
            assert (np.asarray(words)[lane, : len(ref)] == ref.astype(np.uint16)).all()
        decoded = np.asarray(
            o1n_rans32_decode(jnp.asarray(np.asarray(words)), jnp.asarray(lengths), t_len, RATE)
        )
        for lane in range(b):
            n = lengths[lane]
            assert (decoded[:n, lane] == syms[:n, lane]).all(), f"lane {lane}"


class TestDecodeSplitGeometry:
    """Unit tests of the shared VMEM gate / lane-splitting logic with stub
    kernels (no Pallas): sub-kernel sizing, small-batch floor fallback, and
    chunk boundaries."""

    def test_small_batch_uses_actual_lane_count(self):
        from lac_tpu.ops.pallas_rans import _nib_decode_split

        calls = []

        def decode_one(words, lengths, t_len, rate):
            calls.append(words.shape)
            return jnp.zeros((t_len, words.shape[0]), jnp.uint8)

        # fits only at <=64 lanes: a 256-lane floor would reject this
        fits_one = lambda cap, lanes: lanes <= 64
        words = jnp.zeros((64, 8), jnp.uint32)
        lengths = jnp.zeros((64,), jnp.int32)
        out = _nib_decode_split(decode_one, fits_one, words, lengths, 16, 4, "t")
        assert out.shape == (16, 64) and calls == [(64, 8)]

    def test_lane_splitting_chunks_and_rejection(self):
        from lac_tpu.ops.pallas_rans import _nib_decode_split

        calls = []

        def decode_one(words, lengths, t_len, rate):
            calls.append(words.shape[0])
            return jnp.zeros((t_len, words.shape[0]), jnp.uint8)

        fits_one = lambda cap, lanes: lanes <= 512
        words = jnp.zeros((1280, 8), jnp.uint32)
        lengths = jnp.zeros((1280,), jnp.int32)
        out = _nib_decode_split(decode_one, fits_one, words, lengths, 4, 4, "t")
        assert out.shape == (4, 1280) and calls == [512, 512, 256]

        with pytest.raises(ValueError, match="VMEM budget"):
            _nib_decode_split(decode_one, lambda c, l: False, words, lengths, 4, 4, "t")
