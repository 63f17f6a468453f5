"""Turbo byte-path engine: fused Pallas kernels + rANS-32/16.

File bytes -> fixed-size blocks -> coding lanes, processed in fixed-shape
waves of up to MAX_WAVE lanes so every wave reuses one compiled kernel set.
Four kernel-backed models share the container format and coder spec (a
speed/ratio ladder; see docs/DESIGN.md §4.1):

- "order0n" (default): nibble-factorized shift-to-target model — the two
  8-bit nibble CDFs compose into ONE 16-bit rANS step per byte, cutting the
  per-step vector work from [256, B] to [16, B]-class ops (~2-2.5x the
  o0c throughput for ~2% ratio on text; better ratio on high-entropy data).
- "order1n": order-1 nibble factorization (hi nibble conditioned on the
  previous byte's hi nibble) — better ratio than BOTH order0c and order0n,
  faster than order0c; pick it when ratio matters more than peak speed.
- "order2n": order-2-lite (lo nibble additionally conditioned on
  prev hi >> 2; 64 lo contexts) — the best-ratio rung; use block_size
  >= 4096 (at 1024 the extra contexts dilute below order1n).
- "order0c": joint byte-alphabet shift-to-target model (the geometry
  fallback for blocks too large for the fused nibble decode kernels).

Ratio/speed geometry is (block_size, rate). Measured on one v5e chip at
B=32768 lanes sustained: see BASELINE.md.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np

import jax
import jax.numpy as jnp

from ..models.functional import CDF_STATE_BITS  # noqa: F401  (spec anchor)
from ..ops.pallas_rans import (
    o0c_encode_fused,
    o0c_rans32_decode,
    o0n_decode_fits,
    o0n_encode_fused,
    o0n_rans32_decode,
    o1n_decode_fits,
    o1n_encode_fused,
    o1n_rans32_decode,
    o2n_decode_fits,
    o2n_encode_fused,
    o2n_rans32_decode,
)
from ..stream.container import (
    CODEC_RANS32,
    BlockEntry,
    ContainerHeader,
    read_container,
    write_container,
)

__all__ = ["turbo_compress", "turbo_decompress", "turbo_decompress_blocks", "MAX_WAVE"]

MAX_WAVE = 8192  # lanes per dispatch (split into <=2048-lane sub-kernels inside one executable)
_DEFAULT_BLOCK = 1024
_DEFAULT_RATE = 4  # base of the adaptive schedule (must match dist/bench)
_DEFAULT_MODEL = "order0n"
_PB = 16
_TURBO_MODELS = ("order0c", "order0n", "order1n", "order2n")

_CAP_BUCKETS = (64, 128, 192, 256, 384, 512, 768, 1024, 1536, 2048)


def _decode_cap_bucket(maxw: int, block_size: int) -> int:
    # coded lanes never exceed block_size//2+3 words (raw fallback), so the
    # terminal bucket is that, not block_size+2
    top = block_size // 2 + 3
    for c in _CAP_BUCKETS:
        if top >= c >= max(maxw, 3):
            return c
    return top


def _encode_wave(model: str, syms, lengths, rate: int, cap: int):
    if model == "order0n":
        return o0n_encode_fused(syms, lengths, rate, cap)
    if model == "order1n":
        return o1n_encode_fused(syms, lengths, rate, cap)
    if model == "order2n":
        return o2n_encode_fused(syms, lengths, rate, cap)
    return o0c_encode_fused(syms, lengths, 256, _PB, rate, cap)


def _decode_wave(model: str, words, lengths, block_size: int, rate: int):
    if model == "order0n":
        return o0n_rans32_decode(words, lengths, block_size, rate)
    if model == "order1n":
        return o1n_rans32_decode(words, lengths, block_size, rate)
    if model == "order2n":
        return o2n_rans32_decode(words, lengths, block_size, rate)
    return o0c_rans32_decode(words, lengths, block_size, 256, _PB, rate)


def _wave_sizes(n: int) -> list[int]:
    """Fixed shapes to avoid recompiles: full waves + one padded tail wave
    from a small set of bucket sizes."""
    sizes = []
    while n >= MAX_WAVE:
        sizes.append(MAX_WAVE)
        n -= MAX_WAVE
    if n:
        bucket = 128
        while bucket < n:
            bucket *= 2
        sizes.append(bucket)
    return sizes


def turbo_compress(
    data: bytes,
    block_size: int = _DEFAULT_BLOCK,
    rate: int = _DEFAULT_RATE,
    model: str = _DEFAULT_MODEL,
) -> bytes:
    if block_size % 256:
        raise ValueError("turbo block_size must be a multiple of 256")
    if model not in _TURBO_MODELS:
        raise ValueError(f"turbo model must be one of {_TURBO_MODELS}")
    _fits = {"order0n": o0n_decode_fits, "order1n": o1n_decode_fits,
             "order2n": o2n_decode_fits}
    if model in _fits and not _fits[model](
        _decode_cap_bucket(block_size // 2 + 3, block_size), MAX_WAVE
    ):
        model = "order0c"  # geometry fallback: huge blocks use the chunked-decode codec
    n = len(data)
    arr = np.frombuffer(data, dtype=np.uint8)
    nblocks = max(1, -(-n // block_size))
    blocks: list[BlockEntry] = []

    def finish(done0: int, nwords_d, words_d) -> None:
        """Fetch one wave's results and append its BlockEntries. All host
        work is vectorized or contiguous-slice: raw-fallback payloads come
        straight from the input bytes (no strided column copies), coded
        payloads are contiguous row slices of the one byteswapped grid.

        The word grid is fetched SLICED to the wave's coded-lane cap bucket
        (a device slice, then one transfer): the kernels' fixed cap is
        block_size//2+3 but coded lanes rarely exceed ~40% of it, and the
        fetch rides the slow half of the harness tunnel — bucket slicing
        cuts encode download bytes ~25-40% on text (raw-fallback lanes are
        excluded from the bucket: their word counts are immaterial)."""
        with jax.profiler.TraceAnnotation("turbo/encode_fetch"):
            nwords = np.asarray(nwords_d)
            nb = min(len(nwords), nblocks - done0)
            starts = (done0 + np.arange(nb)) * block_size
            lengths_w = np.minimum(block_size, n - starts)
            coded = 2 * nwords[:nb] < np.maximum(lengths_w, 1)
            maxw = int(nwords[:nb][coded].max()) if coded.any() else 0
            bucket = _decode_cap_bucket(maxw, block_size)
            words = np.asarray(words_d[:, :bucket]).astype(">u2")
        for j in range(nb):
            length = int(lengths_w[j])
            if not coded[j] and length > 0:
                # raw fallback: token_count 0 marks an uncoded block, which
                # bounds expansion on incompressible data at ~1.0x
                blocks.append(
                    BlockEntry(length, 0, data[starts[j] : starts[j] + length])
                )
            else:
                blocks.append(
                    BlockEntry(length, length, words[j, : nwords[j]].tobytes())
                )

    done = 0
    fut = None
    # the single worker keeps finish() calls in submission order (so the
    # blocks list stays ordered) while the main thread assembles and
    # dispatches the next wave during wave i's blocking fetch
    with ThreadPoolExecutor(max_workers=1) as pool:
        for wave in _wave_sizes(nblocks):
            # vectorized wave assembly: full blocks land via one reshape;
            # only a possible ragged tail block is copied separately. u8 on
            # the wire — the harness tunnel is bandwidth-bound, so dtype
            # width is host-path throughput (casts happen on device).
            with jax.profiler.TraceAnnotation("turbo/wave_assemble"):
                syms = np.zeros((block_size, wave), dtype=np.uint8)  # time-major
                lengths = np.zeros((wave,), dtype=np.int32)
                span = arr[done * block_size : min((done + wave) * block_size, n)]
                full = len(span) // block_size
                syms[:, :full] = span[: full * block_size].reshape(full, block_size).T
                lengths[:full] = block_size
                if full < wave and full * block_size < len(span):
                    tail = span[full * block_size :]
                    syms[: len(tail), full] = tail
                    lengths[full] = len(tail)
            # cap at block_size//2+3: any lane needing more words than that
            # has payload >= raw and is stored raw below (checked on nwords
            # BEFORE slicing, so truncation of its word list is immaterial)
            cap = block_size // 2 + 3
            words_d, nwords_d = _encode_wave(
                model, jnp.asarray(syms), jnp.asarray(lengths)[None, :], rate, cap
            )
            if fut is not None:
                fut.result()
            fut = pool.submit(finish, done, nwords_d, words_d)
            done += wave
        if fut is not None:
            fut.result()
    header = ContainerHeader(
        codec=CODEC_RANS32,
        prob_bits=_PB,
        model_id=model,
        config={"block_size": block_size, "rate": rate},
        original_len=n,
    )
    return write_container(header, blocks)


def _decode_block_list(header, blocks) -> list[bytes]:
    """Decode a list of independent blocks (wave-batched). The block list
    need not be the container's full list or in container order — this is
    the random-access / resume primitive (SURVEY.md §5 checkpoint row)."""
    block_size = header.config["block_size"]
    rate = header.config["rate"]
    nblocks = len(blocks)
    results: list[bytes] = [b""] * nblocks

    def finish(done0: int, nb: int, lengths: np.ndarray, syms_d) -> None:
        if syms_d is None:
            syms_bt = None
        else:
            # [T, wave] -> contiguous [wave, T] once, so per-block slices
            # are row memcpys instead of strided column gathers
            syms_bt = np.ascontiguousarray(np.asarray(syms_d).T)
        for j in range(nb):
            blk = blocks[done0 + j]
            if blk.token_count == 0 and blk.raw_len > 0:
                results[done0 + j] = blk.payload
            else:
                results[done0 + j] = syms_bt[j, : lengths[j]].tobytes()

    with ThreadPoolExecutor(max_workers=1) as pool:
        _decode_waves(header, blocks, nblocks, results, finish, pool)
    return results


def _decode_waves(header, blocks, nblocks, results, finish, pool):
    block_size = header.config["block_size"]
    rate = header.config["rate"]
    done = 0
    fut = None
    for wave in _wave_sizes(nblocks):
        # cap bucketing: size the word grid to the wave's longest coded
        # payload (few fixed buckets to bound recompiles). Raw-fallback
        # blocks guarantee coded payloads < block_size/2 words, so small
        # buckets dominate in practice.
        nb = min(wave, nblocks - done)
        coded_j: list[int] = []
        payloads: list[bytes] = []
        lengths = np.zeros((wave,), dtype=np.int32)
        for j in range(nb):
            blk = blocks[done + j]
            if not (blk.token_count == 0 and blk.raw_len > 0):
                coded_j.append(j)
                payloads.append(blk.payload)
                lengths[j] = blk.token_count
        syms_d = None
        if coded_j:
            cap = _decode_cap_bucket(max(len(p) for p in payloads) // 2, block_size)
            words = np.zeros((wave, cap), dtype=np.uint16)  # u16 on the wire
            # batch the payload parsing: ONE frombuffer+byteswap over the
            # joined payload bytes, then per-block row memcpys
            flat = np.frombuffer(b"".join(payloads), dtype=">u2").astype(np.uint16)
            off = 0
            for j, p in zip(coded_j, payloads):
                k = len(p) // 2
                words[j, :k] = flat[off : off + k]
                off += k
            syms_d = _decode_wave(
                header.model_id, jnp.asarray(words), jnp.asarray(lengths),
                block_size, rate,
            )
        # one-wave pipeline: fetch of wave i overlaps compute of wave i+1
        # AND the main thread's assembly of wave i+1 (single worker keeps
        # result order)
        if fut is not None:
            fut.result()
        fut = pool.submit(finish, done, nb, lengths, syms_d)
        done += wave
    if fut is not None:
        fut.result()


def turbo_decompress(container: bytes) -> bytes:
    header, blocks = read_container(container)
    if header.codec != CODEC_RANS32 or header.model_id not in _TURBO_MODELS:
        raise ValueError(f"not a turbo {_TURBO_MODELS} container")
    out = b"".join(_decode_block_list(header, blocks))
    if len(out) != header.original_len:
        raise ValueError("decoded length mismatch")
    return out


def turbo_decompress_blocks(container: bytes, indices) -> list[bytes]:
    """Random-access decode of selected blocks only."""
    header, blocks = read_container(container)
    if header.codec != CODEC_RANS32 or header.model_id not in _TURBO_MODELS:
        raise ValueError(f"not a turbo {_TURBO_MODELS} container")
    return _decode_block_list(header, [blocks[i] for i in indices])
