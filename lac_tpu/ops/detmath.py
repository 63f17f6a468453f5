"""Shape-invariant deterministic elementwise math for the det8 forward.

Why this exists: IEEE 754 +, -, *, /, sqrt are CORRECTLY ROUNDED — scalar
and SIMD forms produce identical bits. Transcendentals (exp, tanh, rsqrt,
sin/cos) are APPROXIMATED, and XLA's CPU backend picks different
approximations for scalarized vs vectorized loops — measured: a det8 LM
forward was bit-identical across mesh geometries EXCEPT at one lane per
device, where the batch-1 loops scalarized and exp/rsqrt bits moved. The
det8 contract (models.transformer) therefore uses only correctly-rounded
primitives plus integer ops for everything value-bearing:

- ``det_exp``: exp(x) for x <= 0 as 2^n * P(f) — floor/int-shift/bitcast
  build the exact power of two, a degree-7 Taylor polynomial in exact
  mul/add Horner form supplies 2^f (rel. err ~1e-6, far inside the CDF
  quantization step);
- ``det_rsqrt``: 1/sqrt(x) — two correctly-rounded ops;
- ``det_silu`` / ``det_gelu_tanh``: the standard formulas re-expressed over
  det_exp with sign-splitting so its x <= 0 domain suffices.

RoPE's position sin/cos tables are precomputed on the HOST (numpy float64,
models.transformer._rope_table) and enter the graph as constants — no device
trig at all.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "det_exp", "det_exp_np", "det_rsqrt", "det_silu", "det_gelu_tanh",
    "ceil_log2", "int_sum_pow2",
]

f32 = jnp.float32


def ceil_log2(n: int) -> int:
    """Static ceil(log2(n)) for overflow sizing (0 for n <= 1)."""
    return max(0, int(n - 1).bit_length())


def int_sum_pow2(p: jax.Array, cap: int | None = None) -> tuple[jax.Array, jax.Array, int]:
    """The one integer-denominator rule shared by the attention softmax and
    the CDF quantizer: values p in [0, 1] along the last axis become
    ``pi = round(p * 2^sb)`` (int32) with sb sized so ``sum(pi)`` cannot
    overflow int32. Returns (pi, keepdims int32 sum, sb). Integer addition
    is associative, so the sum's bits cannot depend on reduction tiling.

    ``cap`` (static, >= axis length) pins sb to a fixed axis-capacity so
    graphs that reduce DIFFERENT axis lengths over the same logical value
    set stay bit-identical — the det8 attention softmax passes 2*W (cache
    width W) so a chunked s-token score row and the serial 1-token row of
    the same position quantize with the same sb (chunked encode vs serial
    decode, runtime.lm_engine)."""
    n = cap if cap is not None else p.shape[-1]
    if n < p.shape[-1]:
        raise ValueError(f"int_sum_pow2 cap {cap} < axis length {p.shape[-1]}")
    sb = 30 - ceil_log2(n)
    pi = jnp.round(p * f32(2.0**sb)).astype(jnp.int32)
    return pi, jnp.sum(pi, axis=-1, keepdims=True), sb

_LOG2E = 1.4426950408889634
# Taylor coefficients of 2^f = sum (ln 2)^k / k! * f^k, k = 1..7
_EXP2_C = [
    0.6931471805599453,
    0.2402265069591007,
    0.05550410866482158,
    0.009618129107628477,
    0.0013333558146428443,
    0.00015403530393381608,
    1.5252733804059837e-05,
]


def det_exp(x: jax.Array) -> jax.Array:
    """exp(x) for x <= 0, bit-identical at every tensor shape."""
    y = x.astype(f32) * f32(_LOG2E)
    n = jnp.floor(y)
    f = y - n  # in [0, 1)
    p = f32(_EXP2_C[-1])
    for c in _EXP2_C[-2::-1]:
        p = p * f + f32(c)
    p = p * f + f32(1.0)
    ni = jnp.clip(n, -126.0, 0.0).astype(jnp.int32)
    two_n = jax.lax.bitcast_convert_type((ni + 127) << 23, f32)
    # below 2^-126 the true value underflows anyway; pin it to exactly 0
    return jnp.where(n < -126.0, f32(0.0), p * two_n)


def det_exp_np(x):
    """Host (NumPy) spec mirror of ``det_exp``, bit-identical to the jitted
    CPU computation (cross-checked in tests/test_quantize.py): XLA contracts
    the Horner ``p * f + c`` steps into FMAs (measured: plain NumPy mul+add
    diverges by 1 ulp on ~4% of elements), so the mirror emulates FMA with
    an exact float64 product and a single rounding. (Double rounding through
    f64 can in principle differ from a true FMA at 2^-29-rare tie cases;
    measured zero over 2M samples — this is a spec cross-check, not a
    production path.)"""
    import numpy as np

    def fma32(a, b, c):
        return (a.astype(np.float64) * b + c).astype(np.float32)

    y = (x.astype(np.float32) * np.float32(_LOG2E)).astype(np.float32)
    n = np.floor(y)
    f = (y - n).astype(np.float32)
    p = np.full_like(f, np.float32(_EXP2_C[-1]))
    for c in _EXP2_C[-2::-1]:
        p = fma32(p, f, np.float64(np.float32(c)))
    p = fma32(p, f, np.float64(1.0))
    ni = np.clip(n, -126.0, 0.0).astype(np.int32)
    two_n = ((ni + 127) << 23).view(np.float32)
    return np.where(n < -126.0, np.float32(0.0), (p * two_n).astype(np.float32))


def det_rsqrt(x: jax.Array) -> jax.Array:
    """1/sqrt(x): division and sqrt are correctly rounded, hence
    shape-invariant (lax.rsqrt is an approximation; this is not)."""
    return f32(1.0) / jnp.sqrt(x.astype(f32))


def det_silu(x: jax.Array) -> jax.Array:
    """x * sigmoid(x) over det_exp: t = exp(-|x|) <= 1, then
    sigmoid(x) = 1/(1+t) for x >= 0 else t/(1+t)."""
    xf = x.astype(f32)
    t = det_exp(-jnp.abs(xf))
    sig = jnp.where(xf >= 0, f32(1.0) / (f32(1.0) + t), t / (f32(1.0) + t))
    return xf * sig


def det_gelu_tanh(x: jax.Array) -> jax.Array:
    """The tanh-approximate GELU with tanh built on det_exp:
    tanh(z) = sign(z) * (1 - e)/(1 + e), e = exp(-2|z|).

    Expression shapes matter here: no scalar-literal multiply may chain into
    a tensor multiply — XLA's simplifier canonicalizes (x*c)*t differently
    across sharded graph variants (measured, models.transformer det8 notes).
    Every scalar constant below lands in exactly one multiply."""
    xf = x.astype(f32)
    x3 = (xf * xf) * xf
    z = xf * f32(0.7978845608028654) + x3 * f32(0.035677408136300125)
    e = det_exp(jnp.abs(z) * f32(-2.0))
    th = (jnp.sign(z) * (f32(1.0) - e)) / (f32(1.0) + e)
    return xf * ((f32(1.0) + th) * f32(0.5))
