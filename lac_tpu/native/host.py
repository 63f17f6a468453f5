"""ctypes binding + build for the native (C++) host coder.

Bit-identical to the Pallas byte path (same model arithmetic, same rANS-32/16
spec), so containers are interchangeable between host and TPU producers.
The C++ source ships inside the package (lac_tpu/native/lac_native.cpp) and
is compiled on first use with g++ (-O3 -fopenmp); the .so is cached next to
the source when that directory is writable (repo checkouts), else under
~/.cache/lac_tpu (installed site-packages).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from ..stream.container import (
    CODEC_RANS32,
    BlockEntry,
    ContainerHeader,
    read_container,
    write_container,
)

__all__ = ["native_available", "native_compress", "native_decompress"]

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_PKG_DIR, "lac_native.cpp")


def _so_path() -> str:
    build = os.path.join(_PKG_DIR, "build")
    try:
        os.makedirs(build, exist_ok=True)
        probe = os.path.join(build, ".w")
        with open(probe, "w"):
            pass
        os.remove(probe)
    except OSError:
        build = os.path.join(
            os.path.expanduser(os.environ.get("XDG_CACHE_HOME", "~/.cache")),
            "lac_tpu",
        )
        os.makedirs(build, exist_ok=True)
    return os.path.join(build, "liblac_native.so")


_SO = None  # resolved lazily in _load() so importing stays filesystem-pure

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried, _SO
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            _SO = _so_path()
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                os.makedirs(os.path.dirname(_SO), exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC", "-o", _SO, _SRC],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            lib.o0c_encode_blocks.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p,
            ]
            lib.o0c_decode_blocks.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
            ]
            lib.o0n_encode_blocks.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p,
            ]
            lib.o0n_decode_blocks.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
            ]
            lib.o1n_encode_blocks.argtypes = lib.o0n_encode_blocks.argtypes
            lib.o1n_decode_blocks.argtypes = lib.o0n_decode_blocks.argtypes
            lib.o2n_encode_blocks.argtypes = lib.o0n_encode_blocks.argtypes
            lib.o2n_decode_blocks.argtypes = lib.o0n_decode_blocks.argtypes
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def native_compress(
    data: bytes, block_size: int = 1024, rate: int = 4, model: str = "order0n"
) -> bytes:
    """Same container format (and bit-identical payloads) as
    runtime.turbo.turbo_compress for the same (model, block_size, rate)."""
    if model not in ("order0c", "order0n", "order1n", "order2n"):
        raise ValueError(
            "native model must be order0c, order0n, order1n, or order2n"
        )
    # identical geometry fallback to turbo_compress: containers must stay
    # byte-identical across the two producers AND decodable by the TPU path
    from ..ops.pallas_rans import o0n_decode_fits, o1n_decode_fits, o2n_decode_fits
    from ..runtime.turbo import MAX_WAVE, _decode_cap_bucket

    _fits = {"order0n": o0n_decode_fits, "order1n": o1n_decode_fits,
             "order2n": o2n_decode_fits}
    if model in _fits and not _fits[model](
        _decode_cap_bucket(block_size // 2 + 3, block_size), MAX_WAVE
    ):
        model = "order0c"
    lib = _load()
    if lib is None:
        raise RuntimeError("native coder unavailable (g++ build failed)")
    n = len(data)
    arr = np.frombuffer(data, dtype=np.uint8)
    nblocks = max(1, -(-n // block_size))
    cap = block_size + 2
    offsets = np.arange(nblocks, dtype=np.int32) * block_size
    lengths = np.minimum(block_size, n - offsets).astype(np.int32)
    lengths = np.maximum(lengths, 0)
    words = np.zeros((nblocks, cap), dtype=np.uint16)
    nwords = np.zeros((nblocks,), dtype=np.int32)
    if n:
        if model in ("order0n", "order1n", "order2n"):
            enc = {"order0n": lib.o0n_encode_blocks,
                   "order1n": lib.o1n_encode_blocks,
                   "order2n": lib.o2n_encode_blocks}[model]
            enc(
                arr.ctypes.data, offsets.ctypes.data, lengths.ctypes.data,
                nblocks, cap, rate, words.ctypes.data, nwords.ctypes.data,
            )
        else:
            lib.o0c_encode_blocks(
                arr.ctypes.data, offsets.ctypes.data, lengths.ctypes.data,
                nblocks, cap, rate, 16, words.ctypes.data, nwords.ctypes.data,
            )
    else:
        nwords[:] = 2
        words[:, 0] = 1  # x = RANS32_L
    blocks = []
    for i in range(nblocks):
        payload = words[i, : nwords[i]].astype(">u2").tobytes()
        raw = arr[offsets[i] : offsets[i] + lengths[i]].tobytes()
        if len(payload) >= len(raw) and len(raw) > 0:
            blocks.append(BlockEntry(int(lengths[i]), 0, raw))
        else:
            blocks.append(BlockEntry(int(lengths[i]), int(lengths[i]), payload))
    header = ContainerHeader(
        codec=CODEC_RANS32, prob_bits=16, model_id=model,
        config={"block_size": block_size, "rate": rate}, original_len=n,
    )
    return write_container(header, blocks)


def native_decompress(container: bytes) -> bytes:
    lib = _load()
    if lib is None:
        raise RuntimeError("native coder unavailable (g++ build failed)")
    header, blocks = read_container(container)
    if header.codec != CODEC_RANS32 or header.model_id not in (
        "order0c", "order0n", "order1n", "order2n"
    ):
        raise ValueError("not a turbo (order0c/order0n/order1n/order2n) container")
    block_size, rate = header.config["block_size"], header.config["rate"]
    cap = block_size + 2
    coded = [(i, b) for i, b in enumerate(blocks)
             if not (b.token_count == 0 and b.raw_len > 0)]
    out_parts: dict[int, bytes] = {
        i: b.payload for i, b in enumerate(blocks)
        if b.token_count == 0 and b.raw_len > 0
    }
    if coded:
        nc = len(coded)
        words = np.zeros((nc, cap), dtype=np.uint16)
        lengths = np.zeros((nc,), dtype=np.int32)
        out_offsets = np.zeros((nc,), dtype=np.int32)
        total = 0
        for j, (_, b) in enumerate(coded):
            w = np.frombuffer(b.payload, dtype=">u2")
            words[j, : len(w)] = w
            lengths[j] = b.token_count
            out_offsets[j] = total
            total += b.token_count
        out = np.zeros((total,), dtype=np.uint8)
        if header.model_id in ("order0n", "order1n", "order2n"):
            dec = {"order0n": lib.o0n_decode_blocks,
                   "order1n": lib.o1n_decode_blocks,
                   "order2n": lib.o2n_decode_blocks}[header.model_id]
            dec(
                words.ctypes.data, lengths.ctypes.data, nc, cap, rate,
                out_offsets.ctypes.data, out.ctypes.data,
            )
        else:
            lib.o0c_decode_blocks(
                words.ctypes.data, lengths.ctypes.data, nc, cap, rate, 16,
                out_offsets.ctypes.data, out.ctypes.data,
            )
        for j, (i, b) in enumerate(coded):
            out_parts[i] = out[out_offsets[j] : out_offsets[j] + lengths[j]].tobytes()
    res = b"".join(out_parts[i] for i in range(len(blocks)))
    if len(res) != header.original_len:
        raise ValueError("decoded length mismatch")
    return res
