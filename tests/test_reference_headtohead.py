"""Head-to-head acceptance vs the reference coder (VERDICT round-2 item 3).

The reference (`/root/reference/arith_code.py`) is pure Python and runs in
this image. These tests drive its encoder (`A_to_bin.bits`,
arith_code.py:212-246) and this framework's production rANS coder on the
SAME per-step integer CDF sequences, and assert:

1. both round-trip exactly (identical decoded symbols);
2. lacuna's payload <= reference bits + RANS_FRAMING_BITS (the rANS
   stream's constant framing: a 64-bit final state plus <=32 bits of
   last-word padding — everything else is per-symbol coding efficiency,
   where both coders sit within ~0.1% of the ideal entropy).

"Same CDF sequence" is exact: the reference predictor adapter serves the
identical prob_bits=16 quantized CDFs (ops/quantize) that the rANS path
codes. The adapter's total (2^16) always satisfies the reference's
fudged_dist fast path (arith_code.py:84: dist[-1] <= denom*minp holds for
every live span >= 2^16 at prec=48), so the reference applies no further
quantization of its own — the comparison isolates pure coder overhead.
"""

from __future__ import annotations

import importlib.util
import math
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lac_tpu.coder.rans import rans_decode_np, rans_encode_np
from lac_tpu.models.classical import AdaptiveOrder0
from lac_tpu.ops.quantize import cdf_from_freq_np, quantize_logits_np, rescale_cdf

REF_PATH = "/root/reference/arith_code.py"
PB = 16
PREC = 48  # the reference flagship precision (llama_compress.py:9)
# rANS constant framing: 2 u32 words of final state + worst-case padding of
# the last emitted word. Everything beyond this is real coding overhead.
RANS_FRAMING_BITS = 96

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_PATH), reason="reference checkout not present"
)


def _ref():
    spec = importlib.util.spec_from_file_location("ref_arith_code", REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _CDFSequence:
    """Serves the step-t quantized CDF (cumulative counts, total 2^PB).

    One instance per coder side; `accept` advances the step. Subclasses:
    adaptive (model-backed) or replayed (precomputed array)."""

    def step_cdf(self) -> list[int]:
        raise NotImplementedError

    def accept(self, sym: int) -> None:
        raise NotImplementedError


class _AdaptiveSeq(_CDFSequence):
    def __init__(self):
        self.model = AdaptiveOrder0(256)
        self._cache: tuple[int, list[int]] | None = None

    def step_cdf(self) -> list[int]:
        e = self.model._epoch
        if self._cache is None or self._cache[0] != e:
            self._cache = (e, rescale_cdf(self.model.freq_cdf(), 1 << PB))
        return self._cache[1]

    def accept(self, sym: int) -> None:
        self.model.accept(sym)


class _ReplaySeq(_CDFSequence):
    def __init__(self, cdfs: np.ndarray):
        self.cdfs = cdfs  # [T, V] cumulative (inclusive), total 2^PB
        self.t = 0

    def step_cdf(self) -> list[int]:
        return [int(v) for v in self.cdfs[self.t]]

    def accept(self, sym: int) -> None:
        self.t += 1


def _make_ref_adapter(ref, seq: _CDFSequence):
    """Reference-side predictor serving `seq`'s CDFs through the reference's
    own CDFPredictor machinery (fudged_dist / floor-ceil interval pairing,
    arith_code.py:83-110)."""

    class Adapter(ref.CDFPredictor):
        def __init__(self, s):
            self.seq = s
            self.n = 256

        @property
        def dist(self):
            return self.seq.step_cdf()

        @property
        def minp(self):
            d = self.seq.step_cdf()
            m = d[0] if d[0] > 0 else 1 << PB
            for a, b in zip(d, d[1:]):
                if 0 < b - a < m:
                    m = b - a
            return m

        def accept(self, symbol):
            self.seq.accept(symbol)

        def copy(self):
            return self

    return Adapter(seq)


def _rans_encode_seq(seq: _CDFSequence, syms: np.ndarray) -> np.ndarray:
    lo = np.zeros(len(syms), dtype=np.int64)
    f = np.zeros(len(syms), dtype=np.int64)
    for t, s in enumerate(syms):
        cdf = seq.step_cdf()
        lo[t] = cdf[s - 1] if s > 0 else 0
        f[t] = cdf[s] - (cdf[s - 1] if s > 0 else 0)
        seq.accept(int(s))
    return rans_encode_np(lo, f, PB), f


def _rans_decode_seq(seq: _CDFSequence, words: np.ndarray, n: int) -> list[int]:
    def provider(_t, out):
        if out:
            seq.accept(out[-1])
        return np.concatenate([[0], np.asarray(seq.step_cdf(), dtype=np.int64)])

    return rans_decode_np(words, n, provider, PB)


def _ref_roundtrip(ref, mk_seq, syms: np.ndarray) -> int:
    """Encode+decode with the reference coder; returns the exact bit count."""
    enc = ref.A_to_bin(_make_ref_adapter(ref, mk_seq()), prec=PREC)
    bits = list(enc.bits(list(int(s) for s in syms), stop=1))
    assert set(bits) <= {0, 1}
    dec = ref.A_from_bin(_make_ref_adapter(ref, mk_seq()), prec=PREC)
    out = []
    for s in dec.run(iter(bits), stop=0):
        out.append(s)
        if len(out) >= len(syms):
            break
    if len(out) < len(syms):  # complete-flush streams may resolve on flush
        for s in dec.flush():
            out.append(s)
            if len(out) >= len(syms):
                break
    assert out[: len(syms)] == [int(s) for s in syms], "reference round-trip"
    return len(bits)


def _headtohead(mk_seq, syms: np.ndarray):
    ref = _ref()
    ref_bits = _ref_roundtrip(ref, mk_seq, syms)

    words, f = _rans_encode_seq(mk_seq(), syms)
    ours_bits = len(words) * 32
    decoded = _rans_decode_seq(mk_seq(), words, len(syms))
    assert decoded == [int(s) for s in syms], "rANS round-trip"

    ideal = float(np.sum(PB - np.log2(f.astype(np.float64))))
    return ref_bits, ours_bits, ideal


@pytest.mark.slow
def test_adaptive_order0_payload_beats_reference():
    data = open(os.path.join(os.path.dirname(__file__), "..", "README.md"), "rb").read()
    data = (data * 4)[:16384]
    syms = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    ref_bits, ours_bits, ideal = _headtohead(_AdaptiveSeq, syms)
    # both coders within 0.2% of the ideal entropy of the shared CDFs
    assert ref_bits <= ideal * 1.002 + 64
    assert ours_bits <= ideal * 1.002 + RANS_FRAMING_BITS
    # the acceptance criterion: our payload <= reference + constant framing
    assert ours_bits <= ref_bits + RANS_FRAMING_BITS


@pytest.mark.slow
def test_lm_shaped_cdf_payload_beats_reference():
    """Same acceptance on LM-shaped CDFs: peaked distributions produced by
    the exact quantizer the LM path uses (quantize_logits_np), replayed
    identically to both coders (the 'trained-LM CDF dump' form of the
    criterion — no model forward needed to compare coders)."""
    rng = np.random.default_rng(7)
    T = 4096
    logits = rng.normal(0.0, 4.0, size=(T, 256)).astype(np.float32)
    freq = quantize_logits_np(logits, PB)
    cdfs = np.cumsum(freq, axis=-1)  # inclusive cumulative, total 2^PB
    assert int(cdfs[0, -1]) == 1 << PB
    syms = np.array(
        [rng.choice(256, p=freq[t] / freq[t].sum()) for t in range(T)],
        dtype=np.int64,
    )
    ref_bits, ours_bits, ideal = _headtohead(lambda: _ReplaySeq(cdfs), syms)
    assert ours_bits <= ref_bits + RANS_FRAMING_BITS
    assert ours_bits <= ideal * 1.002 + RANS_FRAMING_BITS
