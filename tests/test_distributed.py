"""Multi-process driver tests: 2 CPU processes via jax.distributed must
produce a container byte-identical to the single-process one
(host-count-invariant bitstreams, SURVEY.md §7 hard part #6), and the
distributed decode must round-trip."""

import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from lac_tpu.runtime.dist import compress_distributed, decompress_distributed


def _text(n: int) -> bytes:
    rng = np.random.default_rng(0)
    words = [b"dist", b"ordered", b"gather", b"hosts", b"blocks", b"spans"]
    out = bytearray()
    while len(out) < n:
        out += words[rng.integers(len(words))] + b" "
    return bytes(out[:n])


def test_single_process_matches_turbo():
    from lac_tpu.runtime.turbo import turbo_compress

    data = _text(6000)
    c1 = compress_distributed(data, block_size=1024)
    c2 = turbo_compress(data, block_size=1024)
    assert c1 == c2
    assert decompress_distributed(c1) == data


WORKER = textwrap.dedent(
    """
    import sys, os
    os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "")
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); port = sys.argv[2]; out = sys.argv[3]
    jax.distributed.initialize(
        coordinator_address="localhost:" + port, num_processes=2, process_id=pid
    )
    import numpy as np
    from lac_tpu.runtime.dist import compress_distributed, decompress_distributed
    rng = np.random.default_rng(0)
    words = [b"dist", b"ordered", b"gather", b"hosts", b"blocks", b"spans"]
    data = bytearray()
    while len(data) < 6000:
        data += words[rng.integers(len(words))] + b" "
    data = bytes(data[:6000])
    c = compress_distributed(data, block_size=1024)
    assert decompress_distributed(c) == data, "distributed round-trip failed"
    if pid == 0:
        open(out, "wb").write(c)
    """
)


@pytest.mark.slow
def test_two_process_container_identical(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo="/root/repo"))
    out = tmp_path / "container.bin"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(port), str(out)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for pid in range(2)
    ]
    for p in procs:
        _, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()[-2000:]
    data = _text(6000)
    single = compress_distributed(data, block_size=1024)
    assert out.read_bytes() == single


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


LM_WORKER = textwrap.dedent(
    """
    import sys, os
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); port = sys.argv[2]; out = sys.argv[3]
    jax.distributed.initialize(
        coordinator_address="localhost:" + port, num_processes=2, process_id=pid
    )
    from lac_tpu.runtime.dist import lm_compress_distributed, lm_decompress_distributed
    data = (b"the quick brown fox jumps over the lazy dog. " * 40)[:1500]
    c = lm_compress_distributed(data, model_ref="prng:tiny:0",
                                block_tokens=256, lanes=4)
    assert lm_decompress_distributed(c) == data, "distributed LM round-trip failed"
    if pid == 0:
        open(out, "wb").write(c)
    """
)


@pytest.mark.slow
def test_two_process_lm_container_identical(tmp_path):
    """The LM container must be host-count-invariant: 2-process span-coded
    output byte-identical to the single-process one (VERDICT round-1 item 3;
    SURVEY.md §7 hard part #6 extended to the LM codec)."""
    port = _free_port()
    script = tmp_path / "lm_worker.py"
    script.write_text(LM_WORKER.format(repo="/root/repo"))
    out = tmp_path / "lm_container.bin"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(port), str(out)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for pid in range(2)
    ]
    for p in procs:
        _, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()[-2000:]
    from lac_tpu.runtime.dist import lm_compress_distributed

    data = (b"the quick brown fox jumps over the lazy dog. " * 40)[:1500]
    single = lm_compress_distributed(data, model_ref="prng:tiny:0",
                                     block_tokens=256, lanes=4)
    assert out.read_bytes() == single


def test_distributed_model_roundtrip_order1n():
    """Every turbo model must round-trip through the distributed driver
    (guards the encode/decode model dispatch staying in sync with the
    container's model_id)."""
    import numpy as np

    from lac_tpu.runtime.dist import compress_distributed, decompress_distributed

    rng = np.random.default_rng(7)
    data = bytes(rng.integers(32, 120, 40000, dtype=np.uint8))
    for model in ("order0n", "order1n", "order2n", "order0c"):
        c = compress_distributed(data, block_size=1024, model=model)
        assert decompress_distributed(c) == data, model


def test_distributed_decode_large_blocks_nibble():
    """Regression: decompress_distributed used a fixed block_size+2 decode
    grid, which blew the nibble kernels' VMEM gate for containers the
    default engine path produces at block_size=4096; the grid must be sized
    from the actual payloads."""
    import numpy as np

    from lac_tpu.runtime.dist import compress_distributed, decompress_distributed

    rng = np.random.default_rng(11)
    data = bytes(rng.integers(32, 120, 5 * 4096 + 777, dtype=np.uint8))
    c = compress_distributed(data, block_size=4096, model="order0n")
    assert decompress_distributed(c) == data
