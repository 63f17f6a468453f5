"""Benchmark entry point for the driver: prints ONE JSON line.

Measures end-to-end encode+decode throughput of the batched byte-level
coding path (BASELINE config #1 class) on a 1 MiB deterministic local-text
corpus, on the default device (real TPU under the driver).

vs_baseline: the reference pipeline is a pure-Python token-serial coder; its
measured speed class on this corpus is ~0.013 MB/s (survey session; our
oracle coder reproduces it). vs_baseline = ours / 0.013.
"""

import glob
import json
import sys
import time


def build_corpus(n: int) -> bytes:
    files = sorted(glob.glob("/usr/lib/python3.11/*.py"))
    data = b"".join(open(f, "rb").read() for f in files)
    if len(data) < n:
        data = data * (n // max(1, len(data)) + 1)
    return data[:n]


def main() -> int:
    sys.path.insert(0, "/root/repo")
    from lac_tpu.runtime.engine import compress_bytes, decompress_bytes

    data = build_corpus(1 << 20)
    # warmup/compile on a small slice (block shapes must match the real run)
    blk = 1 << 16
    warm = data[: 4 * blk]
    c = compress_bytes(warm, model_id="order0", block_size=blk)
    decompress_bytes(c)

    t0 = time.perf_counter()
    comp = compress_bytes(data, model_id="order0", block_size=blk)
    t1 = time.perf_counter()
    out = decompress_bytes(comp)
    t2 = time.perf_counter()
    assert out == data, "round-trip mismatch"

    n_mb = len(data) / 1e6
    enc_mbs = n_mb / (t1 - t0)
    dec_mbs = n_mb / (t2 - t1)
    combined = 2 * n_mb / (t2 - t0)  # encode+decode MB/s
    baseline = 0.013  # reference-class pure-Python coder, MB/s
    print(json.dumps({
        "metric": "order0 1MiB encode+decode throughput",
        "value": round(combined, 4),
        "unit": "MB/s",
        "vs_baseline": round(combined / baseline, 1),
        "detail": {
            "encode_MBps": round(enc_mbs, 4),
            "decode_MBps": round(dec_mbs, 4),
            "bits_per_byte": round(8 * len(comp) / len(data), 4),
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
