"""Property tests for the oracle arithmetic coder: round-trip exactness
across predictors, precisions, and message lengths — the test pyramid the
reference lacks (SURVEY.md §4), covering its verified defect classes:
lossy termination, overflow, and trailing-symbol ambiguity (§2.6)."""

import math
import random

import pytest

from lac_tpu.coder.reference import (
    ArithmeticDecoder,
    ArithmeticEncoder,
    ac_decode,
    ac_encode,
)
from lac_tpu.models.base import StaticCDF, Uniform
from lac_tpu.models.classical import (
    AdaptiveOrder0,
    FSMPredictor,
    HistoryRL,
    MarkovMix,
)


def roundtrip(symbols, make_predictor, precision=48):
    data, nbits = ac_encode(symbols, make_predictor(), precision)
    out = ac_decode(data, len(symbols), make_predictor(), precision, nbits=nbits)
    assert out == list(symbols)
    return data


PREDICTORS = [
    ("uniform3", lambda: Uniform(3), 3),
    ("uniform10", lambda: Uniform(10), 10),
    ("static", lambda: StaticCDF([5, 6, 30, 31]), 4),
    ("order0", lambda: AdaptiveOrder0(8), 8),
    ("history", lambda: HistoryRL(5, window=32), 5),
    ("markov2", lambda: MarkovMix(4, order=2), 4),
    (
        "fsm",
        lambda: FSMPredictor(2, [([9, 1], [0, 1]), ([1, 9], [0, 1])]),
        2,
    ),
    ("ppm", lambda: __import__("lac_tpu.models", fromlist=["PPM"]).PPM(6, order=2), 6),
]


@pytest.mark.parametrize("name,make,n", PREDICTORS, ids=[p[0] for p in PREDICTORS])
@pytest.mark.parametrize("precision", [16, 24, 48])
def test_roundtrip_random(name, make, n, precision):
    rng = random.Random(f"{name}:{precision}")  # deterministic across processes
    for trial in range(12):
        length = rng.choice([0, 1, 2, 3, 17, 100, 400])
        msg = [rng.randrange(n) for _ in range(length)]
        roundtrip(msg, make, precision)


def test_roundtrip_skewed_source():
    # Heavily skewed adaptive source: long runs compress far below 1 bit/sym
    rng = random.Random(7)
    msg = []
    for _ in range(3000):
        msg.append(0 if rng.random() < 0.97 else rng.randrange(1, 8))
    data = roundtrip(msg, lambda: AdaptiveOrder0(8))
    assert len(data) * 8 < 0.45 * len(msg)  # well under 1 bit/symbol


def test_zero_padding_tolerated():
    """Termination must survive the decoder reading arbitrary padding
    (reference impl-#1 failed this ~1/3 of the time, SURVEY.md §2.6.2)."""
    rng = random.Random(3)
    for trial in range(60):
        msg = [rng.randrange(10) for _ in range(rng.randint(1, 50))]
        data, nbits = ac_encode(msg, Uniform(10), 24)
        # decode with no nbits hint: reader pads with zeros past the payload
        out = ac_decode(data, len(msg), Uniform(10), 24)
        assert out == msg


def test_high_precision_large_alphabet():
    """Large alphabets + high precision: the regime where the reference's
    impl #1 overflowed uint64 (SURVEY.md §2.6.1). Python ints + the rescale
    contract must be exact."""
    rng = random.Random(11)
    n = 50000
    msg = [rng.randrange(n) for _ in range(200)]
    roundtrip(msg, lambda: Uniform(n), precision=48)


def test_entropy_accounting_tracks_ideal():
    """Compressed size must be within ~0.5% + O(1) of the model's own
    cross-entropy (the reference measured ~0.4% coder overhead)."""
    rng = random.Random(5)
    cdf = [800, 900, 950, 1000]
    msg = []
    for _ in range(5000):
        r = rng.randrange(1000)
        msg.append(sum(1 for c in cdf if c <= r))
    pred = StaticCDF(cdf)
    enc = ArithmeticEncoder(pred.copy(), 32)
    enc.encode(msg)
    ideal = 0.0
    widths = [800, 100, 50, 50]
    for s in msg:
        ideal += -math.log2(widths[s] / 1000)
    assert enc.total_code_length <= ideal * 1.005 + 2
    data = enc.flush()
    out = ac_decode(data, len(msg), pred.copy(), 32)
    assert out == msg


def test_encoder_decoder_incremental_api():
    """Streaming API: symbols can be pushed/pulled one at a time."""
    pred = AdaptiveOrder0(4)
    enc = ArithmeticEncoder(pred.copy(), 32)
    msg = [0, 1, 2, 3, 0, 0, 1, 2] * 10
    for s in msg:
        enc.encode_symbol(s)
    data = enc.flush()
    dec = ArithmeticDecoder(pred.copy(), data, 32)
    for s in msg:
        assert dec.decode_symbol() == s


def test_copy_independence():
    """predictor.copy() must yield independent state (the reference's
    Llama_AC.copy mutated shared state, SURVEY.md §2.6.6)."""
    p = AdaptiveOrder0(4)
    p.accept(1)
    q = p.copy()
    q.accept(2)
    assert p.counts[2] == 0 and q.counts[2] == 1 and q.counts[1] == 1

    m = MarkovMix(4, 2)
    m.accept(1)
    mc = m.copy()
    mc.accept(2)
    assert m.table != mc.table
