"""Fused Pallas TPU kernels for the byte-alphabet coding path.

The XLA `lax.scan` engine pays 30-400us of dispatch/layout overhead per time
step (measured on v5e) because every step round-trips [B, V] state through
HBM with relayouts. These kernels fuse the per-block loop on chip: model
state lives in VMEM for the whole block and each step is a handful of
vectorized mask/shift/reduce ops.

Model: the shift-to-target CDF predictor (models.functional.Order0CDF) —
the state IS the coder CDF, pre-scaled in [0, 2**pb - V] (coder cdf =
state + k), update is two shifts and a select. No division, no cumsum, no
multiply, no gather in the model.

Coder: rANS-32/16 (coder.rans spec) — u32 state fits Mosaic's 32-bit lanes,
<=1 16-bit word in/out per symbol.

Mosaic constraints that shaped this code (v5e, jax 0.9):
- no 1-D <-> 2-D reshapes of vectors: EVERYTHING is 2-D, oriented [*, B]
  with the B lanes on the lane dim; per-lane scalars are [1, B];
- dynamic lane gathers cannot span >1 vreg (128 lanes): the decoder never
  gathers — each lane's next words sit in a [128, B] FIFO consumed as a
  shift register (read row 0, conditional sublane roll), and the XLA
  wrapper re-gathers a fresh window per 128-step chunk;
- 1-D iota is unsupported: broadcasted_iota only;
- pltpu.roll shifts must be non-negative (roll left 1 == roll right N-1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


__all__ = [
    "o0c_encode_intervals",
    "o0c_encode_fused",
    "rans32_encode_dense",
    "compact_words",
    "o0c_rans32_decode",
    "o0n_encode_intervals",
    "o0n_encode_fused",
    "o0n_rans32_decode",
    "o0n_decode_fits",
    "o1n_encode_intervals",
    "o1n_encode_fused",
    "o1n_rans32_decode",
    "o1n_decode_fits",
    "o2n_encode_intervals",
    "o2n_encode_fused",
    "o2n_rans32_decode",
    "o2n_decode_fits",
    "SENTINEL",
]

SENTINEL = 0xFFFFFFFF  # plain int: traced constants would be captured by kernels
_FIFO = 128

# set True to force interpret mode (CPU tests run interpreted automatically)
INTERPRET = False


def _interp():
    return INTERPRET or jax.default_backend() == "cpu"


def _iota_vb(v: int, b: int) -> jnp.ndarray:
    return lax.broadcasted_iota(jnp.int32, (v, b), 0)


def _cdf_m(prob_bits: int, v: int) -> int:
    # the state lives pre-scaled in [0, M]; coder cdf = state + k (see
    # models.functional — removing the per-step multiply+shift was measured
    # at ~10% of the decode kernel)
    return (1 << prob_bits) - v


def _state_init_vb(v: int, b: int, prob_bits: int) -> jnp.ndarray:
    return (_iota_vb(v, b) * _cdf_m(prob_bits, v)) // v


def _rate_at(base_rate: int, t) -> jnp.ndarray:
    """AV1-style schedule (must match models.functional.adaptive_rate):
    adapt fast while the block is cold, slow down as it ages."""
    t = jnp.asarray(t, dtype=jnp.int32)
    return (
        jnp.int32(base_rate)
        + (t >= 16).astype(jnp.int32)
        + (t >= 32).astype(jnp.int32)
        + (t >= 64).astype(jnp.int32)
        + (t >= 128).astype(jnp.int32)
    )


def _state_update_vb(state, m_le, rate, v: int, prob_bits: int):
    """state [V, B]; m_le [V, B] bool (k <= coded symbol): move toward the
    one-hot cdf. rate: static int, traced i32 scalar, or [1, B] row (a row
    of 31 makes the update an exact no-op for masked-off lanes)."""
    toward_zero = state - (state >> rate)
    toward_total = state + ((_cdf_m(prob_bits, v) - state) >> rate)
    return jnp.where(m_le, toward_zero, toward_total)


# --------------------------------------------------------------------------
# Kernel A: model forward -> per-position (cdf_lo, freq) of known symbols.
# --------------------------------------------------------------------------


def _intervals_kernel(syms_ref, lo_ref, fr_ref, state_ref, *, v, prob_bits, rate, chunk):
    b = state_ref.shape[1]
    m_total = jnp.int32(_cdf_m(prob_bits, v))
    pid = pl.program_id(0)  # hoisted: not available inside fori bodies in interpret mode

    @pl.when(pid == 0)
    def _():
        state_ref[:] = _state_init_vb(v, b, prob_bits)

    def body(i, _):
        t = pid * chunk + i
        s = syms_ref[pl.ds(i, 1), :]  # [1, B]
        state = state_ref[:]
        k = _iota_vb(v, b)
        # one mask serves extraction AND the update; state monotone in k, so
        # max under k<=s picks state[s], min over k>s picks state[s+1] (the
        # empty s=v-1 case falls out as M, making hi = M+v = 2**pb exactly)
        m_le = k <= s
        st_s = jnp.max(jnp.where(m_le, state, 0), axis=0, keepdims=True)
        st_s1 = jnp.min(jnp.where(m_le, m_total, state), axis=0, keepdims=True)
        lo = st_s + s
        hi = st_s1 + s + 1
        lo_ref[pl.ds(i, 1), :] = lo
        fr_ref[pl.ds(i, 1), :] = hi - lo
        state_ref[:] = _state_update_vb(state, m_le, _rate_at(rate, t), v, prob_bits)
        return 0

    lax.fori_loop(0, chunk, body, 0)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def o0c_encode_intervals(syms_tb: jax.Array, v: int, prob_bits: int, rate: int):
    """syms_tb: [T, B] int32 (time-major). Returns (lo [T, B], freq [T, B])."""
    t_len, b = syms_tb.shape
    # chunk scales down with lane count: 3 chunk blocks x2 buffers + state +
    # loop temporaries must fit the 16MB scoped-VMEM budget
    chunk = min(t_len, max(128, (256 * 1024) // b))
    chunk = 1 << (chunk.bit_length() - 1)  # pow2: keeps the divisor loop from
    while t_len % chunk:                   # collapsing at odd lane counts
        chunk //= 2
    grid = t_len // chunk
    kern = functools.partial(
        _intervals_kernel, v=v, prob_bits=prob_bits, rate=rate, chunk=chunk
    )
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[pl.BlockSpec((chunk, b), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((chunk, b), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_len, b), jnp.int32),
            jax.ShapeDtypeStruct((t_len, b), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((v, b), jnp.int32)],
        interpret=_interp(),
    )(syms_tb)


# --------------------------------------------------------------------------
# Kernel B: rANS-32/16 encode (reverse order) -> dense word grid + state.
# --------------------------------------------------------------------------


def _rans32_enc_kernel(
    lo_ref, fr_ref, len_ref, dense_ref, xfin_ref, x_ref, *, prob_bits, chunk
):
    n_prog = pl.num_programs(0)
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _():
        x_ref[:] = jnp.full_like(x_ref, 1 << 16)

    def body(j, _):
        i = chunk - 1 - j  # local reverse
        t = (n_prog - 1 - pid) * chunk + i  # global position
        active = t < len_ref[:]  # [1, B]
        x = x_ref[:]
        fr = fr_ref[pl.ds(i, 1), :].astype(jnp.uint32)
        lo = lo_ref[pl.ds(i, 1), :].astype(jnp.uint32)
        x_max = fr << (32 - prob_bits)
        emit = active & (x >= x_max)
        dense_ref[pl.ds(i, 1), :] = jnp.where(
            emit, x & jnp.uint32(0xFFFF), jnp.uint32(SENTINEL)
        )
        x = jnp.where(emit, x >> 16, x)
        # u32 division via f32 + exact fixup: Mosaic's emulated integer
        # divide dominated this kernel. The quotient fits 16 bits (post-
        # renorm x < fr << 16), so the f32 estimate is off by at most 1;
        # the wrapped-remainder test disambiguates both directions. Same
        # q bit-for-bit => same bitstream.
        # (Mosaic has no u32<->f32 casts: split x into i32-safe halves; the
        # power-of-2 scale is exact in f32 and the sum is within the <1 ulp
        # error budget)
        xf = (
            (x >> 16).astype(jnp.int32).astype(jnp.float32) * 65536.0
            + (x & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)
        )
        qf = xf / fr.astype(jnp.int32).astype(jnp.float32)
        q = qf.astype(jnp.int32).astype(jnp.uint32)
        rem = x - q * fr
        too_big = rem >= jnp.uint32(0x80000000)  # q overshot: rem wrapped
        q = jnp.where(too_big, q - 1, q)
        rem = jnp.where(too_big, rem + fr, rem)
        too_small = rem >= fr
        q = jnp.where(too_small, q + 1, q)
        rem = jnp.where(too_small, rem - fr, rem)
        x_new = (q << prob_bits) + rem + lo
        x_ref[:] = jnp.where(active, x_new, x)
        return 0

    lax.fori_loop(0, chunk, body, 0)

    @pl.when(pid == n_prog - 1)
    def _():
        x = x_ref[:]
        xfin_ref[0:1, :] = x >> 16
        xfin_ref[1:2, :] = x & jnp.uint32(0xFFFF)


@functools.partial(jax.jit, static_argnums=(3,))
def rans32_encode_dense(lo_tb: jax.Array, fr_tb: jax.Array, lengths: jax.Array, prob_bits: int):
    """Reverse-order batched encode. lengths: [1, B]. Returns (dense [T, B]
    u32 — the emitted 16-bit word or SENTINEL per position — and xfinal
    [2, B] u32: the final state as (high, low) 16-bit words)."""
    t_len, b = lo_tb.shape
    chunk = min(t_len, max(128, (256 * 1024) // b))  # scoped-VMEM budget
    chunk = 1 << (chunk.bit_length() - 1)  # pow2 (see o0c_encode_intervals)
    while t_len % chunk:
        chunk //= 2
    grid = t_len // chunk
    kern = functools.partial(_rans32_enc_kernel, prob_bits=prob_bits, chunk=chunk)
    rev = lambda i: (grid - 1 - i, 0)
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((chunk, b), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, b), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_len, b), jnp.uint32),
            jax.ShapeDtypeStruct((2, b), jnp.uint32),
        ],
        scratch_shapes=[pltpu.VMEM((1, b), jnp.uint32)],
        interpret=_interp(),
    )(lo_tb, fr_tb, lengths)


@functools.partial(jax.jit, static_argnums=(2,))
def compact_words(dense: jax.Array, xfin: jax.Array, cap: int):
    """Squeeze the dense word grid into decode order: per lane, rows are
    [x_hi, x_lo, words at ascending t]. Returns (words [B, cap] u32,
    nwords [B] i32).

    Compaction is pull-based binary shifting, not an XLA scatter: the
    scatter formulation was measured at ~10ms device time for [1024, 2048]
    on v5e (~5 cycles/element) while these log2(T) rounds of static slices +
    selects are pure VPU work. Each element's move distance is the count of
    non-emitting rows above it — monotone non-decreasing down the column —
    so resolving the distance one bit at a time (LSB first), where each slot
    *pulls* from 2^k below iff that element still owes that bit, never
    collides (validated exhaustively against the scatter form)."""
    t_len, b = dense.shape
    emit = dense != jnp.uint32(SENTINEL)
    nonemit = (~emit).astype(jnp.int32)
    dist = lax.associative_scan(jnp.add, nonemit, axis=0) - nonemit
    val, live = dense, emit
    sh = 1
    while sh < t_len:
        sval = jnp.concatenate([val[sh:], jnp.zeros((sh, b), val.dtype)], axis=0)
        sdist = jnp.concatenate([dist[sh:], jnp.zeros((sh, b), dist.dtype)], axis=0)
        slive = jnp.concatenate(
            [live[sh:], jnp.zeros((sh, b), jnp.bool_)], axis=0
        )
        pull = slive & ((sdist & sh) != 0)
        val = jnp.where(pull, sval, val)
        new_dist = jnp.where(pull, sdist - sh, dist)
        live = pull | (live & ((dist & sh) == 0))
        dist = new_dist
        sh <<= 1
    val = jnp.where(live, val, jnp.uint32(0))  # deterministic dead slots
    rows = min(cap - 2, t_len)
    words_t = jnp.concatenate([xfin, val[:rows]], axis=0)
    if words_t.shape[0] < cap:
        words_t = jnp.concatenate(
            [words_t, jnp.zeros((cap - words_t.shape[0], b), jnp.uint32)], axis=0
        )
    nwords = 2 + jnp.sum(emit, axis=0, dtype=jnp.int32)
    return words_t.T, nwords


_MAX_KERNEL_LANES = 2048  # wider single kernels crash the Mosaic compiler


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def o0c_encode_fused(syms_tb: jax.Array, lengths: jax.Array, v: int, prob_bits: int,
                     rate: int, cap: int):
    """All three encode stages in ONE executable. The per-executable dispatch
    on the driver's TPU tunnel is ~3ms (measured, v5e via axon); fusing the
    stages saves two dispatches per wave, and lane counts beyond the
    per-kernel maximum are split into sub-kernels INSIDE the executable so
    one dispatch covers arbitrarily wide waves. lengths: [1, B]."""
    # u8 symbols in / u16 words out: host<->device transfers ride the
    # harness tunnel, which is bandwidth-bound — 4x/2x smaller wires than
    # i32/u32 (casts happen on device)
    b = syms_tb.shape[1]
    syms_tb = syms_tb.astype(jnp.int32)
    words, nwords = [], []
    for c0 in range(0, b, _MAX_KERNEL_LANES):
        c1 = min(c0 + _MAX_KERNEL_LANES, b)
        lo, fr = o0c_encode_intervals(syms_tb[:, c0:c1], v, prob_bits, rate)
        dense, xfin = rans32_encode_dense(lo, fr, lengths[:, c0:c1], prob_bits)
        w, nw = compact_words(dense, xfin, cap)
        words.append(w.astype(jnp.uint16))
        nwords.append(nw)
    if len(words) == 1:
        return words[0], nwords[0]
    return jnp.concatenate(words, axis=0), jnp.concatenate(nwords, axis=0)


# --------------------------------------------------------------------------
# Kernel C: fused decode — model + rANS-32/16 for the WHOLE block in one
# pallas_call.
#
# The word streams of all lanes live in a VMEM scratch [cap, B] consumed as
# a shift register: each lane's next word is row 0; a refill pops it with a
# per-lane conditional cyclic roll (dynamic per-lane gathers are unsupported
# on TPU, and an XLA take_along_axis re-gather between 128-step chunks was
# measured at 2.7ms/chunk — more than the chunk kernel itself).
# VMEM budget gates this path; oversized (cap, B) falls back to the chunked
# kernel with per-chunk window re-gather below.
# --------------------------------------------------------------------------


_WIN = 16  # staged-FIFO window: steps between big-buffer advances


def _fifo_word16(wbuf_ref, cur):
    """Next 16-bit word for every lane from the PAIR-PACKED word buffer:
    half (cur & 1) of row (cur >> 1), selected from the top 16 rows by a
    binary tree of static slices (cur stays < 2*_WIN + 1 within a window)."""
    row = _nib_tree1(wbuf_ref[0:16, :], cur >> 1)
    return jnp.where((cur & 1) == 0, row >> 16, row & jnp.uint32(0xFFFF))


def _adv_roll(wb, adv, cap2: int):
    """Advance the word buffer by a per-lane variable row count adv in
    [0, 8] — binary-decomposed conditional rolls, once per window (the
    per-step conditional full-buffer roll this replaces was the decode
    kernels' largest non-search cost)."""
    for sh in (1, 2, 4, 8):
        wb = jnp.where((adv & sh) != 0, pltpu.roll(wb, cap2 - sh, axis=0), wb)
    return wb


def _decode_fused_kernel(
    words_ref, len_ref, syms_ref, wbuf, state_scr, x_scr, cur_scr,
    *, v, prob_bits, rate, cap2,
):
    """The word streams arrive PAIR-PACKED: one u32 row holds two 16-bit
    words (high half first). Consumption is staged: within a _WIN-step
    window, lanes read at a per-lane cursor into the top 16 rows (tree
    select); the buffer itself only advances once per window."""
    b = state_scr.shape[1]
    mask_pb = jnp.uint32((1 << prob_bits) - 1)
    pid = pl.program_id(0)
    k = _iota_vb(v, b)

    @pl.when(pid == 0)
    def _():
        w = words_ref[:]
        x_scr[:] = w[0:1, :]  # row 0 = (x_hi << 16) | x_lo already
        wbuf[:] = pltpu.roll(w, cap2 - 1, axis=0)  # row 0 consumed by init
        cur_scr[:] = jnp.zeros_like(cur_scr)
        state_scr[:] = _state_init_vb(v, b, prob_bits)

    t0 = pid * _FIFO
    lengths = len_ref[:]  # [1, B]
    state, x, cur = state_scr[:], x_scr[:], cur_scr[:]

    for wi in range(_FIFO // _WIN):

        def body(j, carry, wi=wi):
            state, x, cur = carry
            i = wi * _WIN + j
            active = (t0 + i) < lengths
            eff = state + k  # [V, B] (state pre-scaled; +k is the width guard)
            slot = (x & mask_pb).astype(jnp.int32)
            m = eff <= slot  # == (k <= decoded symbol): eff strictly increasing
            s = jnp.sum(m, axis=0, keepdims=True, dtype=jnp.int32) - 1
            lo = jnp.max(jnp.where(m, eff, 0), axis=0, keepdims=True)
            hi = jnp.min(
                jnp.where(m, jnp.int32(1 << prob_bits), eff), axis=0, keepdims=True
            )
            fr = (hi - lo).astype(jnp.uint32)
            x_new = fr * (x >> prob_bits) + (slot - lo).astype(jnp.uint32)
            refill = active & (x_new < jnp.uint32(1 << 16))
            w = _fifo_word16(wbuf, cur)
            x_new = jnp.where(refill, (x_new << 16) | w, x_new)
            cur = cur + refill.astype(jnp.int32)
            syms_ref[pl.ds(i, 1), :] = jnp.where(active, s, 0)
            # inactive lanes: rate 31 makes the update an exact no-op (cheaper
            # than a [V, B] select on `active`)
            rate_row = jnp.where(active, _rate_at(rate, t0 + i), jnp.int32(31))
            state = _state_update_vb(state, m, rate_row, v, prob_bits)
            return state, jnp.where(active, x_new, x), cur

        state, x, cur = lax.fori_loop(0, _WIN, body, (state, x, cur))
        wbuf[:] = _adv_roll(wbuf[:], cur >> 1, cap2)
        cur = cur & 1

    state_scr[:] = state
    x_scr[:] = x
    cur_scr[:] = cur


_FUSED_VMEM_LIMIT = 64 * 1024 * 1024  # v5e VMEM is 128MB; default scoped limit 16MB


def _fused_vmem_ok(cap: int, b: int, v: int) -> bool:
    # packed words input block + wbuf scratch + fori-carry copies + roll
    # temp (~2x the live set, measured) + model state (x2) + syms out block
    cap2 = (cap + 1) // 2
    need = 4 * (5 * cap2 * b + 3 * v * b + 2 * _FIFO * b + 16 * b)
    return need <= _FUSED_VMEM_LIMIT - 4 * 1024 * 1024


def _decode_fused(words, lengths, t_len, v, prob_bits, rate):
    b, cap = words.shape
    n_chunks = -(-t_len // _FIFO)
    cap2 = (cap + 1) // 2
    wt = words.T
    if cap % 2:
        wt = jnp.concatenate([wt, jnp.zeros((1, b), wt.dtype)], axis=0)
    packed = (wt[0::2] << 16) | wt[1::2]
    if cap2 < 16:  # the staged FIFO's tree select reads rows 0..15
        packed = jnp.concatenate(
            [packed, jnp.zeros((16 - cap2, b), packed.dtype)], axis=0
        )
        cap2 = 16
    kern = functools.partial(
        _decode_fused_kernel, v=v, prob_bits=prob_bits, rate=rate, cap2=cap2
    )
    syms = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((cap2, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_FIFO, b), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_chunks * _FIFO, b), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((cap2, b), jnp.uint32),
            pltpu.VMEM((v, b), jnp.int32),
            pltpu.VMEM((1, b), jnp.uint32),
            pltpu.VMEM((1, b), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_FUSED_VMEM_LIMIT),
        interpret=_interp(),
    )(packed, lengths[None, :].astype(jnp.int32))
    return syms[:t_len].astype(jnp.uint8)  # byte alphabet; small fetch wire


# --------------------------------------------------------------------------
# Fallback decode for oversized (cap, B): one 128-step chunk per pallas_call;
# each lane's next words sit in a [128, B] FIFO window re-gathered by the XLA
# wrapper between chunks.
# --------------------------------------------------------------------------


def _decode_chunk_kernel(
    fifo_ref, state_in, x_in, len_ref, t0_ref,
    syms_ref, state_out, x_out, consumed_ref,
    *, v, prob_bits, rate,
):
    b = state_in.shape[1]
    mask_pb = jnp.uint32((1 << prob_bits) - 1)
    t0 = t0_ref[0]
    lengths = len_ref[:]  # [1, B]
    k = _iota_vb(v, b)

    def body(i, carry):
        state, x, fifo, c = carry
        active = (t0 + i) < lengths  # [1, B]
        eff = state + k  # [V, B] (state pre-scaled)
        slot = (x & mask_pb).astype(jnp.int32)  # [1, B]
        m = eff <= slot
        s = jnp.sum(m, axis=0, keepdims=True, dtype=jnp.int32) - 1  # [1, B]
        lo = jnp.max(jnp.where(m, eff, 0), axis=0, keepdims=True)
        hi = jnp.min(
            jnp.where(m, jnp.int32(1 << prob_bits), eff), axis=0, keepdims=True
        )
        fr = (hi - lo).astype(jnp.uint32)
        x_new = fr * (x >> prob_bits) + (slot - lo).astype(jnp.uint32)
        refill = active & (x_new < jnp.uint32(1 << 16))
        w = fifo[0:1, :]  # [1, B]
        x_new = jnp.where(refill, (x_new << 16) | w, x_new)
        # consume: roll rows up by one where refilled (shift must be >= 0)
        fifo = jnp.where(refill, pltpu.roll(fifo, _FIFO - 1, axis=0), fifo)
        syms_ref[pl.ds(i, 1), :] = jnp.where(active, s, 0)
        rate_row = jnp.where(active, _rate_at(rate, t0 + i), jnp.int32(31))
        state = _state_update_vb(state, m, rate_row, v, prob_bits)
        return (
            state,
            jnp.where(active, x_new, x),
            fifo,
            c + refill.astype(jnp.int32),
        )

    init = (
        state_in[:],
        x_in[:],
        fifo_ref[:],
        jnp.zeros_like(consumed_ref),
    )
    state, x, _fifo, c = lax.fori_loop(0, _FIFO, body, init)
    state_out[:] = state
    x_out[:] = x
    consumed_ref[:] = c


def _decode_chunk_call(fifo, state, x, lengths, t0, v, prob_bits, rate):
    b = state.shape[1]
    kern = functools.partial(_decode_chunk_kernel, v=v, prob_bits=prob_bits, rate=rate)
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((_FIFO, b), jnp.int32),  # syms chunk
            jax.ShapeDtypeStruct((v, b), jnp.int32),       # state'
            jax.ShapeDtypeStruct((1, b), jnp.uint32),      # x'
            jax.ShapeDtypeStruct((1, b), jnp.int32),       # consumed
        ],
        interpret=_interp(),
    )(fifo, state, x, lengths, t0)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def o0c_rans32_decode(
    words: jax.Array, lengths: jax.Array, t_len: int, v: int, prob_bits: int, rate: int
):
    """words: [B, cap] u16/u32 (16-bit values, decode order); lengths [B].
    Returns syms [T, B] uint8. Single fused kernel when (cap, B) fits VMEM —
    lane counts beyond the per-kernel maximum run as sub-kernels inside this
    one executable; falls back to the chunked kernel with window re-gather
    for oversized caps. u16 in / u8 out keep the tunnel wires small; casts
    are on-device."""
    words = words.astype(jnp.uint32)
    b, cap = words.shape
    if b > _MAX_KERNEL_LANES and _fused_vmem_ok(cap, _MAX_KERNEL_LANES, v):
        outs = [
            _decode_fused(
                words[c0 : min(c0 + _MAX_KERNEL_LANES, b)],
                lengths[c0 : min(c0 + _MAX_KERNEL_LANES, b)],
                t_len, v, prob_bits, rate,
            )
            for c0 in range(0, b, _MAX_KERNEL_LANES)
        ]
        return jnp.concatenate(outs, axis=1)
    if _fused_vmem_ok(cap, b, v):
        return _decode_fused(words, lengths, t_len, v, prob_bits, rate)
    # chunked fallback below returns i32
    n_chunks = -(-t_len // _FIFO)
    state0 = _state_init_vb(v, b, prob_bits)
    x0 = ((words[:, 0] << 16) | words[:, 1])[None, :]
    pos0 = jnp.full((b,), 2, dtype=jnp.int32)
    len_row = lengths[None, :].astype(jnp.int32)
    offs = jnp.arange(_FIFO, dtype=jnp.int32)[None, :]

    def chunk_step(carry, ci):
        state, x, pos = carry
        window_idx = jnp.minimum(pos[:, None] + offs, cap - 1)
        fifo = jnp.take_along_axis(words, window_idx, axis=1).T  # [FIFO, B]
        t0 = (ci * _FIFO).reshape(1)
        syms_k, state, x, consumed = _decode_chunk_call(
            fifo, state, x, len_row, t0, v, prob_bits, rate
        )
        return (state, x, pos + consumed[0]), syms_k

    _, syms = lax.scan(
        chunk_step, (state0, x0, pos0), jnp.arange(n_chunks, dtype=jnp.int32)
    )
    return syms.reshape(n_chunks * _FIFO, b)[:t_len].astype(jnp.uint8)

# --------------------------------------------------------------------------
# Codec 3 ("order0n"): nibble-factorized shift-to-target model, composed
# into ONE 16-bit rANS step per byte (models.functional.Order0NibCDF is the
# spec; lo12 = (lo_h << 8) + f_h*lo_l, f12 = f_h*f_l tiles [0, 2**16)
# exactly). The coder layer — rans32_encode_dense, compact_words, the
# word-FIFO decode machinery — is IDENTICAL to codec 2's; only the model
# geometry changes: per coded byte the adaptive-model work is a few [16, B]
# ops plus one 16-row context extract/writeback instead of [256, B]
# mask/shift/reduce passes. Measured ~1.9x decode throughput over o0c.
#
# Context plumbing (Mosaic has no per-lane sublane gather): the 16
# lo-nibble tables live context-major in one [256, B] scratch; the active
# context row-block is pulled out by a 4-level binary select tree on the
# bits of h (static slices only), and written back with 16 conditional
# block read-modify-writes gated on (h == c) per lane.
# --------------------------------------------------------------------------

_NV = 16  # nibble alphabet
_NSB = 15  # internal state bits (see models.functional NIB_STATE_BITS)
_NS = 1 << _NSB
_NM = (1 << 8) - _NV  # 240: 8-bit coding domain less the +k guard
_NPB = 16  # composed prob_bits (the coder's; fixed for this codec)


def _nib_update(state, m, rate):
    """[16, B] nibble-state shift-toward update; rate 31 is an exact no-op."""
    toward_zero = state - (state >> rate)
    toward_total = state + ((_NS - state) >> rate)
    return jnp.where(m, toward_zero, toward_total)


def _tree_sel(buf, c, nctx: int):
    """Select context c's row block of a [nctx*R, B] buffer per lane via the
    bits of c [1, B] — log2(nctx) levels of static-slice selects, no gathers
    (XLA/Mosaic gathers cost 2.5-5 cycles/element on TPU; this is the shared
    select primitive of every nibble-context kernel). Returns [R, B] where
    R = buf.shape[0] // nctx."""
    t = buf
    rows = buf.shape[0]
    bit = nctx >> 1
    while bit:
        rows //= 2
        t = jnp.where((c & bit) != 0, t[rows : 2 * rows], t[:rows])
        bit >>= 1
    return t


def _nib_tree16(buf, h):
    """Rows [16h, 16h+16) of a [256, B] buffer per lane."""
    return _tree_sel(buf, h, 16)


def _nib_tree1(buf, h):
    """Row h of a [16, B] buffer per lane (same tree, one row out)."""
    return _tree_sel(buf, h, 16)


def _nib_sl_init(b: int) -> jnp.ndarray:
    return (lax.broadcasted_iota(jnp.int32, (16 * _NV, b), 0) & 15) << (_NSB - 4)


# -- packed-pair context tables ---------------------------------------------
# A 16-row nibble table is stored as 8 u32 rows, two 15-bit states per word
# (low half = even k, high half = odd k). Tree extracts and conditional
# writebacks — the dominant VMEM traffic of the nibble kernels — touch half
# the rows; the arithmetic runs unpacked on (even, odd) [8, B] pairs, so no
# cross-half carry/borrow discipline is needed.


def _nibp_iotas(b: int):
    r = lax.broadcasted_iota(jnp.int32, (8, b), 0)
    return 2 * r, 2 * r + 1  # ke, ko


def _nibp_unpack(p):
    """packed u32 [8, B] -> (even, odd) i32 [8, B] (values <= 2**15)."""
    return (p & jnp.uint32(0xFFFF)).astype(jnp.int32), (p >> 16).astype(jnp.int32)


def _nibp_pack(e, o):
    return (o.astype(jnp.uint32) << 16) | e.astype(jnp.uint32)


def _nibp_table_init(b: int, contexts: int) -> jnp.ndarray:
    """[8*contexts, B] packed uniform tables: row c*8+r packs states for
    k = 2r (low) and k = 2r+1 (high), each k * 2**(NSB-4)."""
    r = lax.broadcasted_iota(jnp.int32, (8 * contexts, b), 0) & 7
    e = (2 * r) << (_NSB - 4)
    o = (2 * r + 1) << (_NSB - 4)
    return _nibp_pack(e, o)


def _nibp_tree8(buf, h):
    """Packed rows [8h, 8h+8) of a [128, B] buffer per lane."""
    return _tree_sel(buf, h, 16)


def _nibp_eff(se, so, ke, ko):
    """Coding-domain boundaries of both halves: eff = ((s*240) >> 15) + k."""
    return ((se * _NM) >> _NSB) + ke, ((so * _NM) >> _NSB) + ko


def _nibp_lohi(effe, effo, me, mo, top):
    """Boundary extraction under a k <= sym mask pair: lo = eff[sym],
    hi = eff[sym+1] with the implicit eff[16] = ``top``."""
    lo = jnp.maximum(
        jnp.max(jnp.where(me, effe, 0), axis=0, keepdims=True),
        jnp.max(jnp.where(mo, effo, 0), axis=0, keepdims=True),
    )
    hi = jnp.minimum(
        jnp.min(jnp.where(me, top, effe), axis=0, keepdims=True),
        jnp.min(jnp.where(mo, top, effo), axis=0, keepdims=True),
    )
    return lo, hi


def _nibp_search(effe, effo, thr, top):
    """Largest sym with eff[sym] <= thr: (sym, lo, hi, me, mo)."""
    me = effe <= thr
    mo = effo <= thr
    sym = (
        jnp.sum(me, axis=0, keepdims=True, dtype=jnp.int32)
        + jnp.sum(mo, axis=0, keepdims=True, dtype=jnp.int32)
        - 1
    )
    lo, hi = _nibp_lohi(effe, effo, me, mo, top)
    return sym, lo, hi, me, mo


def _nibp_update_pair(se, so, me, mo, rate):
    return _nib_update(se, me, rate), _nib_update(so, mo, rate)


def _o0n_intervals_kernel(syms_ref, lo_ref, fr_ref, sh_scr, sl_scr, cnt_scr,
                          *, rate, chunk):
    b = sh_scr.shape[1]
    pid = pl.program_id(0)
    k16 = lax.broadcasted_iota(jnp.int32, (_NV, b), 0)
    ke, ko = _nibp_iotas(b)
    top = jnp.int32(256)

    @pl.when(pid == 0)
    def _():
        sh_scr[:] = k16 << (_NSB - 4)
        sl_scr[:] = _nibp_table_init(b, _NV)
        cnt_scr[:] = jnp.zeros_like(cnt_scr)

    def body(i, carry):
        sh, cnt = carry
        t = pid * chunk + i
        s = syms_ref[pl.ds(i, 1), :]  # [1, B]
        h = s >> 4
        l = s & 15
        effh = ((sh * _NM) >> _NSB) + k16
        mh = k16 <= h
        loh = jnp.max(jnp.where(mh, effh, 0), axis=0, keepdims=True)
        hih = jnp.min(jnp.where(mh, top, effh), axis=0, keepdims=True)
        fh = hih - loh
        se, so = _nibp_unpack(_nibp_tree8(sl_scr[:], h))
        effe, effo = _nibp_eff(se, so, ke, ko)
        me = ke <= l
        mo = ko <= l
        lol, hil = _nibp_lohi(effe, effo, me, mo, top)
        hil = jnp.minimum(hil, top)
        lo_ref[pl.ds(i, 1), :] = (loh << 8) + fh * lol
        fr_ref[pl.ds(i, 1), :] = fh * (hil - lol)
        # updates: hi table on the global-step schedule, lo table on its
        # context's visit count (maturity), matching Order0NibCDF.update
        sh = _nib_update(sh, mh, _rate_at(rate, t))
        rl = _rate_at(rate, _nib_tree1(cnt, h))
        slp = _nibp_pack(*_nibp_update_pair(se, so, me, mo, rl))
        for c in range(_NV):
            pltpu.store(
                sl_scr.at[pl.ds(8 * c, 8), :], slp,
                mask=jnp.broadcast_to(h == c, slp.shape),
            )
        cnt = cnt + (k16 == h).astype(jnp.int32)
        return sh, cnt

    sh, cnt = lax.fori_loop(0, chunk, body, (sh_scr[:], cnt_scr[:]))
    sh_scr[:] = sh
    cnt_scr[:] = cnt


@functools.partial(jax.jit, static_argnums=(1,))
def o0n_encode_intervals(syms_tb: jax.Array, rate: int):
    """syms_tb: [T, B] int32 bytes. Returns composed (lo12, f12) [T, B] i32
    with total 2**16 — feed straight into rans32_encode_dense(pb=16)."""
    t_len, b = syms_tb.shape
    chunk = min(t_len, max(128, (256 * 1024) // b))
    chunk = 1 << (chunk.bit_length() - 1)  # pow2: keeps the divisor loop from
    while t_len % chunk:                   # collapsing at odd lane counts
        chunk //= 2
    grid = t_len // chunk
    kern = functools.partial(_o0n_intervals_kernel, rate=rate, chunk=chunk)
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[pl.BlockSpec((chunk, b), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((chunk, b), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_len, b), jnp.int32),
            jax.ShapeDtypeStruct((t_len, b), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_NV, b), jnp.int32),
            pltpu.VMEM((8 * _NV, b), jnp.uint32),
            pltpu.VMEM((_NV, b), jnp.int32),
        ],
        interpret=_interp(),
    )(syms_tb)


def _nib_encode_fused(intervals_fn, syms_tb, lengths, rate: int, cap: int):
    """Shared fused-encode driver for the nibble codecs: model intervals ->
    rANS dense grid -> compaction, split into <=2048-lane sub-kernels inside
    one executable (see o0c_encode_fused for the dispatch-cost rationale)."""
    b = syms_tb.shape[1]
    syms_tb = syms_tb.astype(jnp.int32)
    words, nwords = [], []
    for c0 in range(0, b, _MAX_KERNEL_LANES):
        c1 = min(c0 + _MAX_KERNEL_LANES, b)
        lo, fr = intervals_fn(syms_tb[:, c0:c1], rate)
        dense, xfin = rans32_encode_dense(lo, fr, lengths[:, c0:c1], _NPB)
        w, nw = compact_words(dense, xfin, cap)
        words.append(w.astype(jnp.uint16))
        nwords.append(nw)
    if len(words) == 1:
        return words[0], nwords[0]
    return jnp.concatenate(words, axis=0), jnp.concatenate(nwords, axis=0)


@functools.partial(jax.jit, static_argnums=(2, 3))
def o0n_encode_fused(syms_tb: jax.Array, lengths: jax.Array, rate: int, cap: int):
    return _nib_encode_fused(o0n_encode_intervals, syms_tb, lengths, rate, cap)


def _o0n_decode_fused_kernel(
    words_ref, len_ref, syms_ref, wbuf, sl_scr, sh_scr, cnt_scr, x_scr, cur_scr,
    *, rate, cap2,
):
    b = sh_scr.shape[1]
    pid = pl.program_id(0)
    k16 = lax.broadcasted_iota(jnp.int32, (_NV, b), 0)
    ke, ko = _nibp_iotas(b)

    @pl.when(pid == 0)
    def _():
        w = words_ref[:]
        x_scr[:] = w[0:1, :]
        wbuf[:] = pltpu.roll(w, cap2 - 1, axis=0)
        cur_scr[:] = jnp.zeros_like(cur_scr)
        sh_scr[:] = k16 << (_NSB - 4)
        sl_scr[:] = _nibp_table_init(b, _NV)
        cnt_scr[:] = jnp.zeros_like(cnt_scr)

    t0 = pid * _FIFO
    lengths = len_ref[:]  # [1, B]
    sh, cnt, x, cur = sh_scr[:], cnt_scr[:], x_scr[:], cur_scr[:]

    for wi in range(_FIFO // _WIN):

        def body(j, carry, wi=wi):
            sh, cnt, x, cur = carry
            i = wi * _WIN + j
            active = (t0 + i) < lengths
            slot = (x & jnp.uint32(0xFFFF)).astype(jnp.int32)
            effh = ((sh * _NM) >> _NSB) + k16
            mh = effh <= (slot >> 8)
            h = jnp.sum(mh, axis=0, keepdims=True, dtype=jnp.int32) - 1
            loh = jnp.max(jnp.where(mh, effh, 0), axis=0, keepdims=True)
            hih = jnp.min(jnp.where(mh, jnp.int32(256), effh), axis=0, keepdims=True)
            fh = hih - loh
            se, so = _nibp_unpack(_nibp_tree8(sl_scr[:], h))
            effe, effo = _nibp_eff(se, so, ke, ko)
            sce = fh * effe  # scaled lo-nibble boundaries: tile [0, fh*256)
            sco = fh * effo
            r = slot - (loh << 8)
            l, lo_s, hi_s, me, mo = _nibp_search(sce, sco, r, fh << 8)
            hi_s = jnp.minimum(hi_s, fh << 8)
            f12 = (hi_s - lo_s).astype(jnp.uint32)
            x_new = f12 * (x >> _NPB) + (r - lo_s).astype(jnp.uint32)
            refill = active & (x_new < jnp.uint32(1 << 16))
            w = _fifo_word16(wbuf, cur)
            x_new = jnp.where(refill, (x_new << 16) | w, x_new)
            cur = cur + refill.astype(jnp.int32)
            syms_ref[pl.ds(i, 1), :] = jnp.where(active, (h << 4) | l, 0)
            rh = jnp.where(active, _rate_at(rate, t0 + i), jnp.int32(31))
            sh = _nib_update(sh, mh, rh)
            rl = jnp.where(active, _rate_at(rate, _nib_tree1(cnt, h)), jnp.int32(31))
            slp = _nibp_pack(*_nibp_update_pair(se, so, me, mo, rl))
            # select-RMW beats a masked store here (measured: masked stores
            # serialize against the tree loads in this kernel)
            for c in range(_NV):
                blk = sl_scr[pl.ds(8 * c, 8), :]
                sl_scr[pl.ds(8 * c, 8), :] = jnp.where(h == c, slp, blk)
            cnt = cnt + jnp.where(active, (k16 == h).astype(jnp.int32), 0)
            return sh, cnt, jnp.where(active, x_new, x), cur

        sh, cnt, x, cur = lax.fori_loop(0, _WIN, body, (sh, cnt, x, cur))
        wbuf[:] = _adv_roll(wbuf[:], cur >> 1, cap2)
        cur = cur & 1

    sh_scr[:] = sh
    cnt_scr[:] = cnt
    x_scr[:] = x
    cur_scr[:] = cur


def _o0n_vmem_ok(cap: int, b: int) -> bool:
    # o0c fused budget + the packed [128, B] lo-table scratch (x RMW temps)
    cap2 = (cap + 1) // 2
    need = 4 * (5 * cap2 * b + 5 * 8 * _NV * b + 2 * _FIFO * b + 16 * b)
    return need <= _FUSED_VMEM_LIMIT - 4 * 1024 * 1024


def o0n_decode_fits(cap: int, b: int) -> bool:
    """Whether the codec-3 fused decode kernel fits VMEM for this geometry
    (turbo gates block_size on this at compress time)."""
    return _o0n_vmem_ok(cap, min(b, _MAX_KERNEL_LANES))


def _nib_decode_call(kernel, extra_scratch, words, lengths, t_len, rate):
    """Shared fused-decode driver for the nibble codecs: pair-pack the word
    grid (padded to the staged FIFO's 16-row minimum), then run `kernel`
    with the common (wbuf, <model scratches>, x, cur) scratch layout."""
    b, cap = words.shape
    n_chunks = -(-t_len // _FIFO)
    cap2 = (cap + 1) // 2
    wt = words.T
    if cap % 2:
        wt = jnp.concatenate([wt, jnp.zeros((1, b), wt.dtype)], axis=0)
    packed = (wt[0::2] << 16) | wt[1::2]
    if cap2 < 16:  # the staged FIFO's tree select reads rows 0..15
        packed = jnp.concatenate(
            [packed, jnp.zeros((16 - cap2, b), packed.dtype)], axis=0
        )
        cap2 = 16
    kern = functools.partial(kernel, rate=rate, cap2=cap2)
    syms = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((cap2, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_FIFO, b), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_chunks * _FIFO, b), jnp.int32),
        scratch_shapes=[pltpu.VMEM((cap2, b), jnp.uint32)]
        + list(extra_scratch(b))
        + [pltpu.VMEM((1, b), jnp.uint32), pltpu.VMEM((1, b), jnp.int32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_FUSED_VMEM_LIMIT),
        interpret=_interp(),
    )(packed, lengths[None, :].astype(jnp.int32))
    return syms[:t_len].astype(jnp.uint8)


def _nib_sub_lanes(fits_one, cap: int, floor: int = 256) -> int:
    """Largest pow2 sub-kernel lane count (<= MAX_KERNEL_LANES) whose VMEM
    budget fits this cap; 0 if even ``floor`` lanes do not fit."""
    sub = _MAX_KERNEL_LANES
    while sub >= floor and not fits_one(cap, sub):
        sub //= 2
    return sub if sub >= floor else 0


def _nib_decode_split(decode_one, fits_one, words, lengths, t_len, rate, name):
    """Shared VMEM gate + sub-kernel lane splitting (lane width shrinks
    below MAX_KERNEL_LANES when the codec's scratch budget demands it —
    e.g. order2n's 64-row context table at block 4096 runs 1024-lane
    sub-kernels)."""
    words = words.astype(jnp.uint32)
    b, cap = words.shape
    sub = _nib_sub_lanes(fits_one, cap)
    if not sub and b < 256:
        # small-batch direct calls: a cap too large for 256-lane sub-kernels
        # may still fit at the (pow2-floored) actual lane count
        f = 1
        while f * 2 <= b:
            f *= 2
        sub = _nib_sub_lanes(fits_one, cap, floor=f)
    if not sub:
        raise ValueError(
            f"{name} decode geometry (cap={cap}, B={b}) exceeds the fused-"
            "kernel VMEM budget; compress with a smaller block_size or codec "
            "order0c"
        )
    if b > sub:
        outs = [
            decode_one(
                words[c0 : min(c0 + sub, b)],
                lengths[c0 : min(c0 + sub, b)],
                t_len, rate,
            )
            for c0 in range(0, b, sub)
        ]
        return jnp.concatenate(outs, axis=1)
    return decode_one(words, lengths, t_len, rate)


def _o0n_decode_fused(words, lengths, t_len, rate):
    scratches = lambda b: [
        pltpu.VMEM((8 * _NV, b), jnp.uint32),  # sl (packed context tables)
        pltpu.VMEM((_NV, b), jnp.int32),       # sh
        pltpu.VMEM((_NV, b), jnp.int32),       # cnt
    ]
    return _nib_decode_call(
        _o0n_decode_fused_kernel, scratches, words, lengths, t_len, rate
    )


@functools.partial(jax.jit, static_argnums=(2, 3))
def o0n_rans32_decode(words: jax.Array, lengths: jax.Array, t_len: int, rate: int):
    """Codec-3 fused decode. words: [B, cap] u16/u32 decode-order; returns
    syms [T, B] uint8. The geometry must satisfy o0n_decode_fits (the
    compressor gates block_size, so every codec-3 container decodes here)."""
    return _nib_decode_split(
        _o0n_decode_fused, _o0n_vmem_ok, words, lengths, t_len, rate, "o0n"
    )


# --------------------------------------------------------------------------
# Codec "order1n": order-1 nibble factorization — the hi nibble is
# conditioned on the PREVIOUS byte's hi nibble (16 contexts, the same
# tree-extract/conditional-writeback machinery the lo tables already use),
# the lo nibble on the current hi nibble. Same composed 16-bit rANS step,
# same coder/compaction/container layers. Better ratio than the joint-byte
# order0c model AND faster ([16, B]-class model ops); order0n remains the
# speed-first default. Spec: models.functional.Order1NibCDF.
# --------------------------------------------------------------------------


def _o1n_intervals_kernel(
    syms_ref, lo_ref, fr_ref, sh_scr, sl_scr, cnth_scr, cntl_scr, ph_scr,
    *, rate, chunk,
):
    b = sl_scr.shape[1]
    pid = pl.program_id(0)
    k16 = lax.broadcasted_iota(jnp.int32, (_NV, b), 0)
    ke, ko = _nibp_iotas(b)
    top = jnp.int32(256)

    @pl.when(pid == 0)
    def _():
        sh_scr[:] = _nibp_table_init(b, _NV)
        sl_scr[:] = _nibp_table_init(b, _NV)
        cnth_scr[:] = jnp.zeros_like(cnth_scr)
        cntl_scr[:] = jnp.zeros_like(cntl_scr)
        ph_scr[:] = jnp.zeros_like(ph_scr)

    def body(i, carry):
        cnth, cntl, ph = carry
        s = syms_ref[pl.ds(i, 1), :]  # [1, B]
        h = s >> 4
        l = s & 15
        she, sho = _nibp_unpack(_nibp_tree8(sh_scr[:], ph))  # ctx prev_h
        effhe, effho = _nibp_eff(she, sho, ke, ko)
        mhe = ke <= h
        mho = ko <= h
        loh, hih = _nibp_lohi(effhe, effho, mhe, mho, top)
        hih = jnp.minimum(hih, top)
        fh = hih - loh
        sle, slo = _nibp_unpack(_nibp_tree8(sl_scr[:], h))
        effle, efflo = _nibp_eff(sle, slo, ke, ko)
        mle = ke <= l
        mlo = ko <= l
        lol, hil = _nibp_lohi(effle, efflo, mle, mlo, top)
        hil = jnp.minimum(hil, top)
        lo_ref[pl.ds(i, 1), :] = (loh << 8) + fh * lol
        fr_ref[pl.ds(i, 1), :] = fh * (hil - lol)
        # both tables adapt on their context's visit count
        rh = _rate_at(rate, _nib_tree1(cnth, ph))
        shp = _nibp_pack(*_nibp_update_pair(she, sho, mhe, mho, rh))
        for c in range(_NV):
            pltpu.store(
                sh_scr.at[pl.ds(8 * c, 8), :], shp,
                mask=jnp.broadcast_to(ph == c, shp.shape),
            )
        cnth = cnth + (k16 == ph).astype(jnp.int32)
        rl = _rate_at(rate, _nib_tree1(cntl, h))
        slp = _nibp_pack(*_nibp_update_pair(sle, slo, mle, mlo, rl))
        for c in range(_NV):
            pltpu.store(
                sl_scr.at[pl.ds(8 * c, 8), :], slp,
                mask=jnp.broadcast_to(h == c, slp.shape),
            )
        cntl = cntl + (k16 == h).astype(jnp.int32)
        return cnth, cntl, h

    cnth, cntl, ph = lax.fori_loop(
        0, chunk, body, (cnth_scr[:], cntl_scr[:], ph_scr[:])
    )
    cnth_scr[:] = cnth
    cntl_scr[:] = cntl
    ph_scr[:] = ph


@functools.partial(jax.jit, static_argnums=(1,))
def o1n_encode_intervals(syms_tb: jax.Array, rate: int):
    """Composed (lo12, f12) for the order-1 nibble model; feed into
    rans32_encode_dense(pb=16) like the order0n path."""
    t_len, b = syms_tb.shape
    chunk = min(t_len, max(128, (256 * 1024) // b))
    chunk = 1 << (chunk.bit_length() - 1)  # pow2: keeps the divisor loop from
    while t_len % chunk:                   # collapsing at odd lane counts
        chunk //= 2
    grid = t_len // chunk
    kern = functools.partial(_o1n_intervals_kernel, rate=rate, chunk=chunk)
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[pl.BlockSpec((chunk, b), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((chunk, b), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_len, b), jnp.int32),
            jax.ShapeDtypeStruct((t_len, b), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((8 * _NV, b), jnp.uint32),
            pltpu.VMEM((8 * _NV, b), jnp.uint32),
            pltpu.VMEM((_NV, b), jnp.int32),
            pltpu.VMEM((_NV, b), jnp.int32),
            pltpu.VMEM((1, b), jnp.int32),
        ],
        interpret=_interp(),
    )(syms_tb)


@functools.partial(jax.jit, static_argnums=(2, 3))
def o1n_encode_fused(syms_tb: jax.Array, lengths: jax.Array, rate: int, cap: int):
    return _nib_encode_fused(o1n_encode_intervals, syms_tb, lengths, rate, cap)


def _o1n_decode_fused_kernel(
    words_ref, len_ref, syms_ref, wbuf, sl_scr, sh_scr, cnth_scr, cntl_scr,
    ph_scr, x_scr, cur_scr, *, rate, cap2,
):
    b = sl_scr.shape[1]
    pid = pl.program_id(0)
    k16 = lax.broadcasted_iota(jnp.int32, (_NV, b), 0)
    ke, ko = _nibp_iotas(b)
    top = jnp.int32(256)

    @pl.when(pid == 0)
    def _():
        w = words_ref[:]
        x_scr[:] = w[0:1, :]
        wbuf[:] = pltpu.roll(w, cap2 - 1, axis=0)
        cur_scr[:] = jnp.zeros_like(cur_scr)
        sh_scr[:] = _nibp_table_init(b, _NV)
        sl_scr[:] = _nibp_table_init(b, _NV)
        cnth_scr[:] = jnp.zeros_like(cnth_scr)
        cntl_scr[:] = jnp.zeros_like(cntl_scr)
        ph_scr[:] = jnp.zeros_like(ph_scr)

    t0 = pid * _FIFO
    lengths = len_ref[:]  # [1, B]
    cnth, cntl, x, cur, ph = (
        cnth_scr[:], cntl_scr[:], x_scr[:], cur_scr[:], ph_scr[:]
    )

    for wi in range(_FIFO // _WIN):

        def body(j, carry, wi=wi):
            cnth, cntl, x, cur, ph = carry
            i = wi * _WIN + j
            active = (t0 + i) < lengths
            slot = (x & jnp.uint32(0xFFFF)).astype(jnp.int32)
            she, sho = _nibp_unpack(_nibp_tree8(sh_scr[:], ph))
            effhe, effho = _nibp_eff(she, sho, ke, ko)
            h, loh, hih, mhe, mho = _nibp_search(effhe, effho, slot >> 8, top)
            hih = jnp.minimum(hih, top)
            fh = hih - loh
            sle, slo = _nibp_unpack(_nibp_tree8(sl_scr[:], h))
            effle, efflo = _nibp_eff(sle, slo, ke, ko)
            r = slot - (loh << 8)
            l, lo_s, hi_s, mle, mlo = _nibp_search(fh * effle, fh * efflo, r, fh << 8)
            hi_s = jnp.minimum(hi_s, fh << 8)
            f12 = (hi_s - lo_s).astype(jnp.uint32)
            x_new = f12 * (x >> _NPB) + (r - lo_s).astype(jnp.uint32)
            refill = active & (x_new < jnp.uint32(1 << 16))
            w = _fifo_word16(wbuf, cur)
            x_new = jnp.where(refill, (x_new << 16) | w, x_new)
            cur = cur + refill.astype(jnp.int32)
            syms_ref[pl.ds(i, 1), :] = jnp.where(active, (h << 4) | l, 0)
            rh = jnp.where(active, _rate_at(rate, _nib_tree1(cnth, ph)), jnp.int32(31))
            shp = _nibp_pack(*_nibp_update_pair(she, sho, mhe, mho, rh))
            # select-RMW: masked stores serialize against tree loads here
            for c in range(_NV):
                blk = sh_scr[pl.ds(8 * c, 8), :]
                sh_scr[pl.ds(8 * c, 8), :] = jnp.where(ph == c, shp, blk)
            cnth = cnth + jnp.where(active, (k16 == ph).astype(jnp.int32), 0)
            rl = jnp.where(active, _rate_at(rate, _nib_tree1(cntl, h)), jnp.int32(31))
            slp = _nibp_pack(*_nibp_update_pair(sle, slo, mle, mlo, rl))
            for c in range(_NV):
                blk = sl_scr[pl.ds(8 * c, 8), :]
                sl_scr[pl.ds(8 * c, 8), :] = jnp.where(h == c, slp, blk)
            cntl = cntl + jnp.where(active, (k16 == h).astype(jnp.int32), 0)
            ph = jnp.where(active, h, ph)
            return cnth, cntl, jnp.where(active, x_new, x), cur, ph

        cnth, cntl, x, cur, ph = lax.fori_loop(
            0, _WIN, body, (cnth, cntl, x, cur, ph)
        )
        wbuf[:] = _adv_roll(wbuf[:], cur >> 1, cap2)
        cur = cur & 1

    cnth_scr[:] = cnth
    cntl_scr[:] = cntl
    x_scr[:] = x
    cur_scr[:] = cur
    ph_scr[:] = ph


def _o1n_vmem_ok(cap: int, b: int) -> bool:
    # o0n budget + the second packed [128, B] context-table scratch
    cap2 = (cap + 1) // 2
    need = 4 * (5 * cap2 * b + 9 * 8 * _NV * b + 2 * _FIFO * b + 24 * b)
    return need <= _FUSED_VMEM_LIMIT - 4 * 1024 * 1024


def o1n_decode_fits(cap: int, b: int) -> bool:
    return _o1n_vmem_ok(cap, min(b, _MAX_KERNEL_LANES))


def _o1n_decode_fused(words, lengths, t_len, rate):
    scratches = lambda b: [
        pltpu.VMEM((8 * _NV, b), jnp.uint32),  # sl (packed context tables)
        pltpu.VMEM((8 * _NV, b), jnp.uint32),  # sh (packed context tables)
        pltpu.VMEM((_NV, b), jnp.int32),       # cnth
        pltpu.VMEM((_NV, b), jnp.int32),       # cntl
        pltpu.VMEM((1, b), jnp.int32),         # prev_h
    ]
    return _nib_decode_call(
        _o1n_decode_fused_kernel, scratches, words, lengths, t_len, rate
    )


@functools.partial(jax.jit, static_argnums=(2, 3))
def o1n_rans32_decode(words: jax.Array, lengths: jax.Array, t_len: int, rate: int):
    """Order-1 nibble fused decode (see o0n_rans32_decode for contracts)."""
    return _nib_decode_split(
        _o1n_decode_fused, _o1n_vmem_ok, words, lengths, t_len, rate, "o1n"
    )


# --------------------------------------------------------------------------
# Codec "order2n": order-2-lite nibble factorization — hi | prev_h (16
# contexts, as order1n) and lo | (h, prev_h >> 2) (64 contexts). Spec:
# models.functional.Order2NibCDF (simulated 4.19 bpb at block 4096 on
# python-source vs o1n's 4.26; the full 256-context (h, prev_h) table wins
# only 0.03 more bpb for ~4x further tree/writeback traffic). Designed for
# block_size >= 4096 — at 1024 the 64 contexts dilute below order1n.
# --------------------------------------------------------------------------

_NL2 = 64  # lo contexts: h * 4 + (prev_h >> 2)


_nibp_tree_sel = _tree_sel  # packed rows [8c, 8c+8) of an [8*nctx, B] buffer
_row_tree_sel = _tree_sel   # row c of an [nctx, B] buffer


def _o2n_intervals_kernel(
    syms_ref, lo_ref, fr_ref, sh_scr, sl_scr, cnth_scr, cntl_scr, ph_scr,
    *, rate, chunk,
):
    b = sl_scr.shape[1]
    pid = pl.program_id(0)
    k16 = lax.broadcasted_iota(jnp.int32, (_NV, b), 0)
    k64 = lax.broadcasted_iota(jnp.int32, (_NL2, b), 0)
    ke, ko = _nibp_iotas(b)
    top = jnp.int32(256)

    @pl.when(pid == 0)
    def _():
        sh_scr[:] = _nibp_table_init(b, _NV)
        sl_scr[:] = _nibp_table_init(b, _NL2)
        cnth_scr[:] = jnp.zeros_like(cnth_scr)
        cntl_scr[:] = jnp.zeros_like(cntl_scr)
        ph_scr[:] = jnp.zeros_like(ph_scr)

    def body(i, carry):
        cnth, cntl, ph = carry
        s = syms_ref[pl.ds(i, 1), :]  # [1, B]
        h = s >> 4
        l = s & 15
        she, sho = _nibp_unpack(_nibp_tree8(sh_scr[:], ph))  # ctx prev_h
        effhe, effho = _nibp_eff(she, sho, ke, ko)
        mhe = ke <= h
        mho = ko <= h
        loh, hih = _nibp_lohi(effhe, effho, mhe, mho, top)
        hih = jnp.minimum(hih, top)
        fh = hih - loh
        lc = h * 4 + (ph >> 2)
        sle, slo = _nibp_unpack(_nibp_tree_sel(sl_scr[:], lc, _NL2))
        effle, efflo = _nibp_eff(sle, slo, ke, ko)
        mle = ke <= l
        mlo = ko <= l
        lol, hil = _nibp_lohi(effle, efflo, mle, mlo, top)
        hil = jnp.minimum(hil, top)
        lo_ref[pl.ds(i, 1), :] = (loh << 8) + fh * lol
        fr_ref[pl.ds(i, 1), :] = fh * (hil - lol)
        rh = _rate_at(rate, _nib_tree1(cnth, ph))
        shp = _nibp_pack(*_nibp_update_pair(she, sho, mhe, mho, rh))
        for c in range(_NV):
            pltpu.store(
                sh_scr.at[pl.ds(8 * c, 8), :], shp,
                mask=jnp.broadcast_to(ph == c, shp.shape),
            )
        cnth = cnth + (k16 == ph).astype(jnp.int32)
        rl = _rate_at(rate, _row_tree_sel(cntl, lc, _NL2))
        slp = _nibp_pack(*_nibp_update_pair(sle, slo, mle, mlo, rl))
        for c in range(_NL2):
            pltpu.store(
                sl_scr.at[pl.ds(8 * c, 8), :], slp,
                mask=jnp.broadcast_to(lc == c, slp.shape),
            )
        cntl = cntl + (k64 == lc).astype(jnp.int32)
        return cnth, cntl, h

    cnth, cntl, ph = lax.fori_loop(
        0, chunk, body, (cnth_scr[:], cntl_scr[:], ph_scr[:])
    )
    cnth_scr[:] = cnth
    cntl_scr[:] = cntl
    ph_scr[:] = ph


@functools.partial(jax.jit, static_argnums=(1,))
def o2n_encode_intervals(syms_tb: jax.Array, rate: int):
    """Composed (lo12, f12) for the order-2-lite nibble model."""
    t_len, b = syms_tb.shape
    chunk = min(t_len, max(128, (256 * 1024) // b))
    chunk = 1 << (chunk.bit_length() - 1)
    while t_len % chunk:
        chunk //= 2
    grid = t_len // chunk
    kern = functools.partial(_o2n_intervals_kernel, rate=rate, chunk=chunk)
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[pl.BlockSpec((chunk, b), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((chunk, b), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_len, b), jnp.int32),
            jax.ShapeDtypeStruct((t_len, b), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((8 * _NV, b), jnp.uint32),   # sh (packed)
            pltpu.VMEM((8 * _NL2, b), jnp.uint32),  # sl (packed, 64 ctx)
            pltpu.VMEM((_NV, b), jnp.int32),
            pltpu.VMEM((_NL2, b), jnp.int32),
            pltpu.VMEM((1, b), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_FUSED_VMEM_LIMIT),
        interpret=_interp(),
    )(syms_tb)


@functools.partial(jax.jit, static_argnums=(2, 3))
def o2n_encode_fused(syms_tb: jax.Array, lengths: jax.Array, rate: int, cap: int):
    return _nib_encode_fused(o2n_encode_intervals, syms_tb, lengths, rate, cap)


def _o2n_decode_fused_kernel(
    words_ref, len_ref, syms_ref, wbuf, sl_scr, sh_scr, cnth_scr, cntl_scr,
    ph_scr, x_scr, cur_scr, *, rate, cap2,
):
    b = sl_scr.shape[1]
    pid = pl.program_id(0)
    k16 = lax.broadcasted_iota(jnp.int32, (_NV, b), 0)
    k64 = lax.broadcasted_iota(jnp.int32, (_NL2, b), 0)
    ke, ko = _nibp_iotas(b)
    top = jnp.int32(256)

    @pl.when(pid == 0)
    def _():
        w = words_ref[:]
        x_scr[:] = w[0:1, :]
        wbuf[:] = pltpu.roll(w, cap2 - 1, axis=0)
        cur_scr[:] = jnp.zeros_like(cur_scr)
        sh_scr[:] = _nibp_table_init(b, _NV)
        sl_scr[:] = _nibp_table_init(b, _NL2)
        cnth_scr[:] = jnp.zeros_like(cnth_scr)
        cntl_scr[:] = jnp.zeros_like(cntl_scr)
        ph_scr[:] = jnp.zeros_like(ph_scr)

    t0 = pid * _FIFO
    lengths = len_ref[:]  # [1, B]
    cnth, cntl, x, cur, ph = (
        cnth_scr[:], cntl_scr[:], x_scr[:], cur_scr[:], ph_scr[:]
    )

    for wi in range(_FIFO // _WIN):

        def body(j, carry, wi=wi):
            cnth, cntl, x, cur, ph = carry
            i = wi * _WIN + j
            active = (t0 + i) < lengths
            slot = (x & jnp.uint32(0xFFFF)).astype(jnp.int32)
            she, sho = _nibp_unpack(_nibp_tree8(sh_scr[:], ph))
            effhe, effho = _nibp_eff(she, sho, ke, ko)
            h, loh, hih, mhe, mho = _nibp_search(effhe, effho, slot >> 8, top)
            hih = jnp.minimum(hih, top)
            fh = hih - loh
            lc = h * 4 + (ph >> 2)
            sle, slo = _nibp_unpack(_nibp_tree_sel(sl_scr[:], lc, _NL2))
            effle, efflo = _nibp_eff(sle, slo, ke, ko)
            r = slot - (loh << 8)
            l, lo_s, hi_s, mle, mlo = _nibp_search(fh * effle, fh * efflo, r, fh << 8)
            hi_s = jnp.minimum(hi_s, fh << 8)
            f12 = (hi_s - lo_s).astype(jnp.uint32)
            x_new = f12 * (x >> _NPB) + (r - lo_s).astype(jnp.uint32)
            refill = active & (x_new < jnp.uint32(1 << 16))
            w = _fifo_word16(wbuf, cur)
            x_new = jnp.where(refill, (x_new << 16) | w, x_new)
            cur = cur + refill.astype(jnp.int32)
            syms_ref[pl.ds(i, 1), :] = jnp.where(active, (h << 4) | l, 0)
            rh = jnp.where(active, _rate_at(rate, _nib_tree1(cnth, ph)), jnp.int32(31))
            shp = _nibp_pack(*_nibp_update_pair(she, sho, mhe, mho, rh))
            for c in range(_NV):
                blk = sh_scr[pl.ds(8 * c, 8), :]
                sh_scr[pl.ds(8 * c, 8), :] = jnp.where(ph == c, shp, blk)
            cnth = cnth + jnp.where(active, (k16 == ph).astype(jnp.int32), 0)
            rl = jnp.where(active, _rate_at(rate, _row_tree_sel(cntl, lc, _NL2)),
                           jnp.int32(31))
            slp = _nibp_pack(*_nibp_update_pair(sle, slo, mle, mlo, rl))
            for c in range(_NL2):
                blk = sl_scr[pl.ds(8 * c, 8), :]
                sl_scr[pl.ds(8 * c, 8), :] = jnp.where(lc == c, slp, blk)
            cntl = cntl + jnp.where(active, (k64 == lc).astype(jnp.int32), 0)
            ph = jnp.where(active, h, ph)
            return cnth, cntl, jnp.where(active, x_new, x), cur, ph

        cnth, cntl, x, cur, ph = lax.fori_loop(
            0, _WIN, body, (cnth, cntl, x, cur, ph)
        )
        wbuf[:] = _adv_roll(wbuf[:], cur >> 1, cap2)
        cur = cur & 1

    cnth_scr[:] = cnth
    cntl_scr[:] = cntl
    x_scr[:] = x
    cur_scr[:] = cur
    ph_scr[:] = ph


def _o2n_vmem_ok(cap: int, b: int) -> bool:
    # o1n budget with the lo context table (and its RMW temps) at 64 rows
    cap2 = (cap + 1) // 2
    need = 4 * (5 * cap2 * b + 9 * 8 * (_NV + _NL2) * b + 2 * _FIFO * b + 24 * b)
    return need <= _FUSED_VMEM_LIMIT - 4 * 1024 * 1024


def o2n_decode_fits(cap: int, b: int) -> bool:
    del b  # the splitter narrows lanes until the budget fits
    return _nib_sub_lanes(_o2n_vmem_ok, cap) > 0


def _o2n_decode_fused(words, lengths, t_len, rate):
    scratches = lambda b: [
        pltpu.VMEM((8 * _NL2, b), jnp.uint32),  # sl (packed, 64 ctx)
        pltpu.VMEM((8 * _NV, b), jnp.uint32),   # sh (packed)
        pltpu.VMEM((_NV, b), jnp.int32),        # cnth
        pltpu.VMEM((_NL2, b), jnp.int32),       # cntl
        pltpu.VMEM((1, b), jnp.int32),          # prev_h
    ]
    return _nib_decode_call(
        _o2n_decode_fused_kernel, scratches, words, lengths, t_len, rate
    )


@functools.partial(jax.jit, static_argnums=(2, 3))
def o2n_rans32_decode(words: jax.Array, lengths: jax.Array, t_len: int, rate: int):
    """Order-2-lite nibble fused decode (see o0n_rans32_decode for contracts)."""
    return _nib_decode_split(
        _o2n_decode_fused, _o2n_vmem_ok, words, lengths, t_len, rate, "o2n"
    )
