"""Observability: entropy accounting, throughput counters, profiler hooks.

Keeps the reference's exact fractional-bit accounting idea
(total_encoded_entropy = emitted + carried info, arith_code.py:220-226;
bits_per_token live counters, arithmetic_coding.py:243-247) vectorized per
stream, and adds what it lacked: the measured-vs-ideal coder-overhead gap as
a regression metric, wall-clock throughput, jax.profiler trace capture, and
structured JSONL logs (SURVEY.md §5 tracing/metrics rows).
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from dataclasses import dataclass, field

import numpy as np

__all__ = [
    "stream_stats",
    "Throughput",
    "profile_trace",
    "JsonlLogger",
    "ngram_stats",
    "measure_compress",
]


def stream_stats(freq: np.ndarray, lengths: np.ndarray, payload_bytes: np.ndarray,
                 prob_bits: int) -> dict:
    """Per-stream ideal vs actual coding cost.

    freq: [B, T] the coded symbols' quantized frequencies (0 on padding);
    lengths: [B]; payload_bytes: [B] actual payload sizes. The ideal cost of
    a stream is sum(-log2(freq/2**prob_bits)) over its coded positions; the
    gap to actual is the coder overhead (the reference measured ~0.4% for
    its oracle; rANS should sit well under 0.1% + the 8-byte state flush).
    """
    freq = np.asarray(freq, dtype=np.float64)
    t = freq.shape[1]
    mask = np.arange(t)[None, :] < np.asarray(lengths)[:, None]
    with np.errstate(divide="ignore"):
        bits = np.where(mask, prob_bits - np.log2(np.maximum(freq, 1)), 0.0)
    ideal_bits = bits.sum(axis=1)
    actual_bits = 8.0 * np.asarray(payload_bytes, dtype=np.float64)
    total_ideal = float(ideal_bits.sum())
    total_actual = float(actual_bits.sum())
    return {
        "ideal_bits": ideal_bits,
        "actual_bits": actual_bits,
        "total_ideal_bits": total_ideal,
        "total_actual_bits": total_actual,
        "coder_overhead": (total_actual - total_ideal) / max(total_ideal, 1e-9),
        "bits_per_symbol": total_actual / max(1, int(np.asarray(lengths).sum())),
    }


@dataclass
class Throughput:
    """Wall-clock throughput accumulator (bytes and symbols per second)."""

    name: str = ""
    bytes_done: int = 0
    symbols_done: int = 0
    _t0: float = field(default_factory=time.perf_counter)

    def add(self, nbytes: int = 0, nsymbols: int = 0) -> None:
        self.bytes_done += nbytes
        self.symbols_done += nsymbols

    @property
    def seconds(self) -> float:
        return time.perf_counter() - self._t0

    def report(self) -> dict:
        dt = max(self.seconds, 1e-9)
        return {
            "name": self.name,
            "seconds": round(dt, 4),
            "MB_per_s": round(self.bytes_done / dt / 1e6, 4),
            "symbols_per_s": round(self.symbols_done / dt, 1),
        }


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a jax.profiler trace (TensorBoard/XProf format) around the
    enclosed region — the framework's analog of the reference's debug_log
    event hook, at hardware granularity."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def ngram_stats(data, order: int) -> dict:
    """n-gram frequency counts of a symbol sequence.

    Capability parity with the reference's ``nth_order_stats``
    (arith_code.py:353-361), vectorized: returns {ngram tuple: count} for
    all ``order``-grams. Also reports the empirical conditional entropy an
    order-(n-1) model could reach, which the reference's tool left to the
    caller."""
    seq = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray)) \
        else np.asarray(data)
    n = len(seq)
    if order < 1 or n < order:
        return {"counts": {}, "unique": 0, "conditional_entropy_bits": 0.0}
    windows = np.lib.stride_tricks.sliding_window_view(seq, order)
    uniq, counts = np.unique(windows, axis=0, return_counts=True)
    table = {tuple(int(x) for x in row): int(c) for row, c in zip(uniq, counts)}
    # H(X_n | X_1..X_{n-1}) = H(n-gram) - H((n-1)-gram)
    p = counts / counts.sum()
    h_n = float(-(p * np.log2(p)).sum())
    if order > 1:
        w1 = np.lib.stride_tricks.sliding_window_view(seq, order - 1)
        _, c1 = np.unique(w1, axis=0, return_counts=True)
        p1 = c1 / c1.sum()
        h_cond = h_n - float(-(p1 * np.log2(p1)).sum())
    else:
        h_cond = h_n
    return {"counts": table, "unique": len(table), "conditional_entropy_bits": h_cond}


def measure_compress(
    data,
    predictor,
    precision: int = 48,
    report_every: int = 0,
    out=sys.stderr,
) -> tuple[bytes, dict]:
    """Instrumented oracle-coder compression harness.

    Capability parity with the reference's only benchmark runner
    (``measure_compress``, arith_code.py:401-420): codes ``data`` (bytes or
    symbol sequence) with the host arithmetic coder, optionally live-printing
    symbols / total fractional code length / bits-per-symbol every
    ``report_every`` symbols, and returns (payload, stats)."""
    from .coder.reference import ArithmeticEncoder

    syms = list(data) if isinstance(data, (bytes, bytearray)) else list(data)
    enc = ArithmeticEncoder(predictor.copy(), precision)
    t0 = time.perf_counter()
    for i, s in enumerate(syms, 1):
        enc.encode_symbol(s)
        if report_every and i % report_every == 0:
            tot = enc.total_code_length
            print(
                f"{i} symbols -> {tot:.2f} bits, {tot / i:.4f} bits/sym",
                file=out, flush=True,
            )
    payload = enc.flush()
    dt = time.perf_counter() - t0
    stats = {
        "symbols": len(syms),
        "payload_bytes": len(payload),
        "emitted_bits": enc.emitted_bits,
        "bits_per_symbol": 8 * len(payload) / max(1, len(syms)),
        "seconds": dt,
        "symbols_per_s": len(syms) / max(dt, 1e-9),
    }
    return payload, stats


class JsonlLogger:
    """Structured event log (one JSON object per line)."""

    def __init__(self, path: str | None = None):
        self._fh = open(path, "a") if path else sys.stderr

    def log(self, event: str, **fields) -> None:
        rec = {"ts": round(time.time(), 3), "event": event, **fields}
        self._fh.write(json.dumps(rec, sort_keys=True) + "\n")
        self._fh.flush()
