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


class TestTokenAlphabet:
    """lm_compress_tokens / lm_compress_text: the reference's actual
    flagship interface (llama_compress.py codes the tokenizer's token
    stream, not raw bytes). Arbitrary model vocab, minimal-width raw
    fallback, tokenizer losslessness guard."""

    def _model(self, vocab):
        import jax

        from lac_tpu.models import transformer as tfm

        cfg = tfm.tiny_config(vocab=vocab, max_seq=64)
        return cfg, tfm.init_params(cfg, jax.random.PRNGKey(1))

    def test_tokens_roundtrip_wide_vocab(self):
        from lac_tpu.runtime.lm_api import lm_compress_tokens, lm_decompress_tokens

        model = self._model(300)  # >256: raw fallback packs >u2
        rng = np.random.default_rng(2)
        # skewed ids (codable) with an incompressible uniform tail block
        ids = np.concatenate([
            rng.integers(0, 7, 400), rng.integers(0, 300, 80)
        ]).astype(np.int32)
        c = lm_compress_tokens(ids, "prng:x:0", block_tokens=80, lanes=4,
                               model=model)
        back = lm_decompress_tokens(c, model=model)
        assert back.dtype == np.int32 and (back == ids).all()
        header, _ = read_container(c)
        assert header.config["alphabet"] == "tokens"
        assert header.config["vocab"] == 300
        assert header.original_len == ids.size

    def test_alphabet_cross_api_refusal_and_id_range(self):
        from lac_tpu.runtime.lm_api import (
            lm_compress_tokens,
            lm_decompress_bytes,
            lm_decompress_tokens,
        )

        model = self._model(300)
        ids = np.arange(50, dtype=np.int32) % 7
        c = lm_compress_tokens(ids, "prng:x:0", block_tokens=64, lanes=2,
                               model=model)
        with pytest.raises(ValueError, match="token-alphabet"):
            lm_decompress_bytes(c, model=model)
        cb = lm_compress_bytes(_text(100), "prng:tiny:0", block_tokens=64,
                               lanes=2, model=MODEL)
        with pytest.raises(ValueError, match="byte-alphabet"):
            lm_decompress_tokens(cb, model=MODEL)
        with pytest.raises(ValueError, match="token ids"):
            lm_compress_tokens(np.array([0, 300], np.int32), "prng:x:0",
                               model=model)

    def test_text_frontend_and_losslessness_guard(self):
        from lac_tpu.runtime.lm_api import lm_compress_text, lm_decompress_text

        class CharTok:
            def __init__(self, alphabet):
                self.alphabet = list(alphabet)
                self.index = {ch: i for i, ch in enumerate(self.alphabet)}

            def encode(self, s):
                return [self.index[ch] for ch in s]

            def decode(self, ids):
                return "".join(self.alphabet[i] for i in ids)

        class LossyTok(CharTok):
            def decode(self, ids):  # normalizing tokenizer: drops case
                return super().decode(ids).lower()

        alpha = "abcdefgh XYZ"
        tok = CharTok(alpha)
        model = self._model(len(alpha))
        text = "abc abca Xbg haZ " * 30
        text = "".join(ch for ch in text if ch in tok.index)
        c = lm_compress_text(text, tok, model_ref="prng:x:0", block_tokens=64,
                             lanes=4, model=model)
        assert lm_decompress_text(c, tok, model=model) == text
        with pytest.raises(ValueError, match="not lossless"):
            lm_compress_text("XYZ", LossyTok(alpha), model_ref="prng:x:0",
                             model=model)
