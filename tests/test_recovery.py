"""Partial-decode / recovery API (reference parity: from_bin returns
(sampler, exception, partial_output) on truncated input,
arithmetic_coding.py:331-336 — here the contract is the good-prefix
recovery of independent CRC'd blocks)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lac_tpu.runtime.lm_api import lm_compress_bytes, lm_decompress_prefix
from lac_tpu.stream.container import scan_container


def _payload_offset(container: bytes, blocks, i: int) -> int:
    """Byte offset of block i's payload within the container."""
    start = len(container) - sum(len(b.payload) for b in blocks)
    return start + sum(len(b.payload) for b in blocks[:i])


DATA = bytes(
    (np.random.default_rng(3).integers(97, 110, 1500)).astype(np.uint8)
) * 2  # 3000 bytes


@pytest.fixture(scope="module")
def lm_container():
    return lm_compress_bytes(DATA, model_ref="prng:tiny:0", block_tokens=128,
                             lanes=4)


def test_intact_container_recovers_fully(lm_container):
    out, rep = lm_decompress_prefix(lm_container)
    assert rep["ok"] and out == DATA
    assert rep["recovered_blocks"] == rep["total_blocks"]


def test_truncated_container_recovers_prefix(lm_container):
    cut = lm_container[: int(len(lm_container) * 0.6)]
    out, rep = lm_decompress_prefix(cut)
    assert not rep["ok"]
    assert 0 < rep["recovered_blocks"] < rep["total_blocks"]
    assert rep["recovered_bytes"] == rep["recovered_blocks"] * 128
    assert out == DATA[: len(out)]


def test_corrupt_middle_block_recovers_prefix(lm_container):
    _, blocks, _ = scan_container(lm_container)
    k = len(blocks) // 2
    off = _payload_offset(lm_container, blocks, k)
    bad = bytearray(lm_container)
    bad[off] ^= 0xFF
    out, rep = lm_decompress_prefix(bytes(bad))
    assert rep["bad_blocks"][0] == k and rep["recovered_blocks"] == k
    assert out == DATA[: k * 128]


def test_truncated_block_table_scan():
    _, blocks, _ = scan_container(lm_compress_bytes(
        DATA[:512], model_ref="prng:tiny:0", block_tokens=128, lanes=4))
    c = lm_compress_bytes(DATA[:512], model_ref="prng:tiny:0",
                          block_tokens=128, lanes=4)
    # cut inside the block table: header parses, missing entries marked bad
    hdr_end = len(c) - sum(len(b.payload) for b in blocks) - 16 * len(blocks)
    cut = c[: hdr_end + 16]  # one intact table entry
    header, blks, bad = scan_container(cut)
    assert len(blks) == len(blocks) and bad  # all-but-first marked bad
    assert set(bad) == set(range(1, len(blocks))) | ({0} if 0 in bad else set())


def test_byte_container_recover_roundtrip(tmp_path):
    """CLI recover path on a byte-model container."""
    from lac_tpu.cli import main
    from lac_tpu.runtime.engine import compress_bytes

    c = compress_bytes(DATA, model_id="order0", block_size=512)
    _, blocks, _ = scan_container(c)
    bad = bytearray(c)
    bad[_payload_offset(c, blocks, 3)] ^= 0x55
    src = tmp_path / "x.lac"
    src.write_bytes(bytes(bad))
    dst = tmp_path / "x.out"
    rc = main(["recover", str(src), "-o", str(dst)])
    assert rc == 1  # partial recovery signalled
    assert dst.read_bytes() == DATA[: 3 * 512]
