"""Decoder-only transformer LM — the framework's inference engine.

Replaces the reference's external llama.cpp dependency (its only native
component, reached via ctypes: llama_compress.py:6-9,22-38) with a
TPU-native implementation: pure functions over an explicit params pytree,
jit/pjit-friendly, covering both GPT-2-style (learned positions, LayerNorm,
GELU, biases) and Llama-style (RoPE, RMSNorm, SiLU-GLU, GQA, no biases)
architectures via one config.

Design rules (these are correctness constraints, not style):

- **Every dtype is explicit.** Coder code runs under scoped x64; a single
  weakly-typed ``jnp.arange`` would silently promote to f64/i64 and change
  numerics between traces. Activations run in ``cfg.dtype``; logits are
  always float32.
- **Exact causal masking**: masked scores are set to -inf with ``where`` (not
  a large negative), so masked positions contribute exactly zero after
  softmax — a position's logits are bit-independent of future-token content
  within the same compiled shape. This is what makes the prefill usable for
  encode-side CDFs in fast-encode mode.
- **Fixed shapes**: step (S=1) and prefill (S=W) are the only two shapes; the
  encode and decode engines run the SAME compiled computation on the same
  schedule, which is the determinism contract (SURVEY.md §2.5).
- ``vocab + 1`` embedding rows: the last row is the BOS prior (the reference
  primes with the Llama BOS token, llama_compress.py:20-23); the output head
  has exactly ``vocab`` columns.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.detmath import (
    ceil_log2,
    det_exp,
    det_gelu_tanh,
    det_rsqrt,
    det_silu,
    int_sum_pow2,
)

__all__ = [
    "LMConfig",
    "init_params",
    "init_cache",
    "forward",
    "stack_layers",
    "ensure_w8",
    "init_params_w8",
    "GPT2_SMALL",
    "TINYLLAMA_1B",
    "LLAMA2_7B",
    "LLAMA3_8B",
    "tiny_config",
]

f32 = jnp.float32


@dataclass(frozen=True)
class LMConfig:
    vocab: int
    d_model: int
    n_layers: int
    n_heads: int
    n_kv_heads: int
    d_ff: int
    max_seq: int
    pos_embedding: str = "rope"      # "rope" | "learned"
    norm: str = "rmsnorm"            # "rmsnorm" | "layernorm"
    act: str = "silu_glu"            # "silu_glu" | "gelu"
    use_bias: bool = False
    tie_embeddings: bool = False
    dtype: Any = jnp.bfloat16
    rope_theta: float = 10000.0
    norm_eps: float = 1e-5
    # Topology-invariant deterministic forward (SURVEY.md §2.5 hard part
    # #6). When True, every order-sensitive REDUCTION in the forward runs in
    # integer arithmetic — matmul accumulation (int8/dual-int8 operands,
    # int32 accumulators), softmax denominators, and norm statistics — while
    # elementwise work stays float32. Integer addition is associative, so
    # the bits cannot depend on how a mesh tiles the reductions: the same
    # weights give bit-identical logits-derived CDFs at every TP/DP width
    # (measured; tests/test_multichip.py). False = plain float forward
    # (fastest; bits then depend on mesh geometry, which the container pins).
    det8: bool = False
    # int8 weights (serving-style W8A8, opt-in speed mode for the float
    # path). Lock-step coding at TinyLlama/7B scale is weights-HBM-bound
    # (BASELINE.md: the 1.1B forward streams ~2.2 GB of bf16 weights per
    # step), so storing every dense projection as int8 + one f32 scale per
    # output column halves the dominant per-step traffic and runs the
    # projections on the MXU's native int8 path (activations quantized per
    # row on the fly). Also the 7B enabler on one v5e: 6.7 GB of weights
    # instead of 13.5. Changes the bitstream (quantized projections ->
    # different logits) — container-flagged and fingerprint-gated like kv8,
    # combinable with kv8 (disjoint routes), exclusive with det8 (which does
    # its own dual-int8 quantization). Params must be pre-quantized with
    # ``ensure_w8`` (the engines do this on entry).
    w8: bool = False
    # int8 KV cache (serving-style, opt-in speed mode for the float path).
    # Lock-step decode reads the WHOLE cache every step, so K/V bytes are
    # the dominant per-step HBM traffic even after the growing-cache
    # schedule (measured ~44% of the byte-12l step at B=256); storing the
    # cache as int8 rows + one f32 scale per (layer, lane, position, head)
    # halves that and runs the cache-route score/out contractions on the
    # MXU's native int8 path. Changes the bitstream (quantized attention ->
    # slightly different logits) — gated by the container fingerprint like
    # every other forward mode. Mutually exclusive with det8 (which does its
    # own dual-int8 quantization on the fly).
    kv8: bool = False
    # Ring-buffer sliding-window cache (opt-in coding mode for blocks longer
    # than the context; the engine sets it via dataclasses.replace, like
    # kv8). The cache write cursor wraps modulo the cache width while RoPE
    # keeps GLOBAL positions: RoPE is exactly relative (R(a)^T R(b) =
    # R(b-a)), so a query at position p attending cached keys rotated at
    # their own absolute positions sees exactly the relative offsets 1..W —
    # the same distribution as a training crop, with no re-prime prefill at
    # all (the reprime schedule re-encodes keep=W-W/overlap tokens per
    # W/overlap coded). Each token gets the FULL W-token context instead of
    # reprime's W-W/overlap..W range, and layer-l representations carry
    # receptive fields beyond the window (Transformer-XL-style evaluation).
    # Requires rope positions (a learned table would index out of range).
    # Composes with w8/kv8 and with det8 (whose host RoPE tables are sized
    # by ``rope_positions`` and whose chunked encode splits chunks at ring
    # boundaries + applies the ring-age mask — see _attention).
    slide: bool = False
    # Global-position bound for det8's host RoPE tables under slide (the
    # float path computes trig on the fly and ignores this). 0 = max_seq.
    # The engine sets it to the block length when building the slide cfg.
    rope_positions: int = 0

    def __post_init__(self):
        if self.det8 and (self.w8 or self.kv8):
            raise ValueError(
                "det8 is mutually exclusive with w8/kv8 (it quantizes on its own)"
            )
        if self.slide and self.pos_embedding != "rope":
            raise ValueError("slide mode requires rope positions")

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    @property
    def bos_id(self) -> int:
        return self.vocab  # extra embedding row


def tiny_config(vocab: int = 256, **kw) -> LMConfig:
    """Small random-init model for tests and CI."""
    defaults = dict(
        vocab=vocab, d_model=64, n_layers=2, n_heads=4, n_kv_heads=2,
        d_ff=128, max_seq=128, dtype=jnp.float32,
    )
    defaults.update(kw)
    return LMConfig(**defaults)


# Architecture presets (dimensions per the public model cards; loaders in
# hf_loader.py fill these from checkpoints when available).
GPT2_SMALL = LMConfig(
    vocab=50257, d_model=768, n_layers=12, n_heads=12, n_kv_heads=12,
    d_ff=3072, max_seq=1024, pos_embedding="learned", norm="layernorm",
    act="gelu", use_bias=True, tie_embeddings=True, dtype=jnp.bfloat16,
)
TINYLLAMA_1B = LMConfig(
    vocab=32000, d_model=2048, n_layers=22, n_heads=32, n_kv_heads=4,
    d_ff=5632, max_seq=2048, dtype=jnp.bfloat16,
)
LLAMA2_7B = LMConfig(
    vocab=32000, d_model=4096, n_layers=32, n_heads=32, n_kv_heads=32,
    d_ff=11008, max_seq=4096, dtype=jnp.bfloat16,
)
LLAMA3_8B = LMConfig(
    vocab=128256, d_model=4096, n_layers=32, n_heads=32, n_kv_heads=8,
    d_ff=14336, max_seq=8192, dtype=jnp.bfloat16, rope_theta=500000.0,
)


# --------------------------------------------------------------------------
# Parameters
# --------------------------------------------------------------------------


def init_params(cfg: LMConfig, key: jax.Array) -> dict:
    """Random init (scaled normal). HF loaders overwrite these tensors."""
    d, h, kvh, hd, ff = cfg.d_model, cfg.n_heads, cfg.n_kv_heads, cfg.head_dim, cfg.d_ff
    keys = iter(jax.random.split(key, 4 + 16 * cfg.n_layers))

    def dense(k, fan_in, shape):
        return (jax.random.normal(k, shape, f32) / jnp.sqrt(f32(fan_in))).astype(cfg.dtype)

    params: dict = {
        "embed": dense(next(keys), 1, (cfg.vocab + 1, d)) * 0.02 * jnp.sqrt(f32(1)),
        "final_norm": {"scale": jnp.ones((d,), cfg.dtype)},
        "layers": [],
    }
    if cfg.pos_embedding == "learned":
        params["pos_embed"] = dense(next(keys), 1, (cfg.max_seq, d)) * 0.01
    if not cfg.tie_embeddings:
        params["head"] = dense(next(keys), d, (d, cfg.vocab))
    if cfg.norm == "layernorm":
        params["final_norm"]["bias"] = jnp.zeros((d,), cfg.dtype)
    for _ in range(cfg.n_layers):
        layer = {
            "ln1": {"scale": jnp.ones((d,), cfg.dtype)},
            "ln2": {"scale": jnp.ones((d,), cfg.dtype)},
            "wq": dense(next(keys), d, (d, h * hd)),
            "wk": dense(next(keys), d, (d, kvh * hd)),
            "wv": dense(next(keys), d, (d, kvh * hd)),
            "wo": dense(next(keys), h * hd, (h * hd, d)),
            "w_up": dense(next(keys), d, (d, ff)),
            "w_down": dense(next(keys), ff, (ff, d)),
        }
        if cfg.act == "silu_glu":
            layer["w_gate"] = dense(next(keys), d, (d, ff))
        if cfg.norm == "layernorm":
            layer["ln1"]["bias"] = jnp.zeros((d,), cfg.dtype)
            layer["ln2"]["bias"] = jnp.zeros((d,), cfg.dtype)
        if cfg.use_bias:
            for name, width in [
                ("bq", h * hd), ("bk", kvh * hd), ("bv", kvh * hd), ("bo", d),
                ("b_up", ff), ("b_down", d),
            ]:
                layer[name] = jnp.zeros((width,), cfg.dtype)
        params["layers"].append(layer)
    # per-layer init (bit-identical to the historical per-layer layout),
    # stored stacked for the scan-over-layers forward
    params["layers"] = stack_layers(params["layers"])
    return params


def init_params_w8(cfg: LMConfig, key: jax.Array) -> dict:
    """STAGED on-device random init + w8 quantization for big models.

    The one-shot fused ``jit(ensure_w8(init_params(...)))`` holds the whole
    bf16 tree as a compiler-scheduled ghost — at Llama-3-8B shapes that is
    ~16 GiB and the fused init itself ResourceExhausts once anything else
    shares the chip (measurements/r4_llama8b_b96.log dies in param init).
    This variant allocates the quantized [L, ...] accumulators up front,
    then initializes+quantizes ONE layer per dispatch with the accumulator
    donated — peak extra footprint is a single layer's bf16 tensors
    (~0.5 GiB at 8B) instead of the full tree.

    Weight DISTRIBUTION matches init_params (scaled normal); the PRNG key
    schedule differs, which is immaterial for random-weight capability
    probes (encode and decode share the same resident tree). Same tree
    structure as ``ensure_w8(init_params(...))``: W8_KEYS and the head are
    ``(int8, f32 scale)`` tuples with the 1/127^2 constant folded in."""
    if not cfg.w8:
        raise ValueError("init_params_w8 requires cfg.w8")
    d, h, kvh, hd, ff = cfg.d_model, cfg.n_heads, cfg.n_kv_heads, cfg.head_dim, cfg.d_ff

    def dense(k, fan_in, shape):
        return (jax.random.normal(k, shape, f32) / jnp.sqrt(f32(fan_in))).astype(cfg.dtype)

    def qw(w, axis):
        q, s = _q8(w.astype(f32), axis=axis)
        return q, s * f32(1.0 / (127.0 * 127.0))

    def layer_q(k):
        ks = jax.random.split(k, 7)
        layer = {
            "ln1": {"scale": jnp.ones((d,), cfg.dtype)},
            "ln2": {"scale": jnp.ones((d,), cfg.dtype)},
            "wq": qw(dense(ks[0], d, (d, h * hd)), 0),
            "wk": qw(dense(ks[1], d, (d, kvh * hd)), 0),
            "wv": qw(dense(ks[2], d, (d, kvh * hd)), 0),
            "wo": qw(dense(ks[3], h * hd, (h * hd, d)), 0),
            "w_up": qw(dense(ks[4], d, (d, ff)), 0),
            "w_down": qw(dense(ks[5], ff, (ff, d)), 0),
        }
        if cfg.act == "silu_glu":
            layer["w_gate"] = qw(dense(ks[6], d, (d, ff)), 0)
        if cfg.norm == "layernorm":
            layer["ln1"]["bias"] = jnp.zeros((d,), cfg.dtype)
            layer["ln2"]["bias"] = jnp.zeros((d,), cfg.dtype)
        if cfg.use_bias:
            for name, width in [
                ("bq", h * hd), ("bk", kvh * hd), ("bv", kvh * hd), ("bo", d),
                ("b_up", ff), ("b_down", d),
            ]:
                layer[name] = jnp.zeros((width,), cfg.dtype)
        return layer

    key_tail, *layer_keys = jax.random.split(key, cfg.n_layers + 1)
    shapes = jax.eval_shape(layer_q, layer_keys[0])
    acc = jax.tree.map(
        lambda s: jnp.zeros((cfg.n_layers,) + s.shape, s.dtype), shapes)

    @functools.partial(jax.jit, donate_argnums=0)
    def set_layer(acc, l, k):
        new = layer_q(k)
        return jax.tree.map(
            lambda a, n: jax.lax.dynamic_update_index_in_dim(a, n, l, 0),
            acc, new)

    for l, lk in enumerate(layer_keys):
        acc = set_layer(acc, jnp.int32(l), lk)

    @jax.jit
    def tail(k):
        ke, kh = jax.random.split(k)
        p = {
            "embed": dense(ke, 1, (cfg.vocab + 1, d)) * 0.02,
            "final_norm": {"scale": jnp.ones((d,), cfg.dtype)},
        }
        if cfg.norm == "layernorm":
            p["final_norm"]["bias"] = jnp.zeros((d,), cfg.dtype)
        if cfg.pos_embedding == "learned":
            p["pos_embed"] = dense(kh, 1, (cfg.max_seq, d)) * 0.01
        wh = (p["embed"][: cfg.vocab].T if cfg.tie_embeddings
              else dense(kh, d, (d, cfg.vocab)))
        p["head"] = qw(wh, axis=0)
        return p

    params = tail(key_tail)
    params["layers"] = acc
    return params


def stack_layers(layers: list[dict]) -> dict:
    """Per-layer param dicts -> one dict whose leaves carry a leading
    ``[n_layers, ...]`` axis — the layout ``forward``'s ``lax.scan`` over
    layers consumes. Loaders (hf_loader, train.load_checkpoint) build
    per-layer lists for clarity and stack once here."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def init_cache(cfg: LMConfig, batch: int, window: int | None = None) -> dict:
    """KV cache over the context window, stacked ``[L, B, W, KVH, Dh]``.
    ``pos`` is the shared write cursor (all lanes run lock-step).

    The stacked layout pairs with the scan-over-layers ``forward``: each
    layer's slice is *read* as a scan input (xs), fresh K/V come out as
    stacked scan outputs (ys), and the whole cache updates via ONE
    dynamic_update_slice per forward — not one per layer. (A stacked cache
    with per-layer in-scan updates was measured 10x step cost on v5e in
    round 1; read-only xs + a single outer update avoids that rebuild.)

    ``window`` (default cfg.max_seq) sizes the cache: every decode step
    reads the WHOLE cache (static shapes), so blocks shorter than the model
    context should size it to the block length — attention HBM traffic per
    step is proportional to the cache length (measured dominant at
    byte-12l scale: 2.4GB/step at window 1024, B=256)."""
    hd, kvh = cfg.head_dim, cfg.n_kv_heads
    w = cfg.max_seq if window is None else min(window, cfg.max_seq)
    if cfg.kv8:
        if cfg.det8:
            raise ValueError("kv8 and det8 are mutually exclusive forward modes")
        return {
            "k": jnp.zeros((cfg.n_layers, batch, w, kvh, hd), jnp.int8),
            "ks": jnp.zeros((cfg.n_layers, batch, w, kvh, 1), f32),
            "v": jnp.zeros((cfg.n_layers, batch, w, kvh, hd), jnp.int8),
            "vs": jnp.zeros((cfg.n_layers, batch, w, kvh, 1), f32),
            "pos": jnp.zeros((), jnp.int32),
        }
    return {
        "k": jnp.zeros((cfg.n_layers, batch, w, kvh, hd), cfg.dtype),
        "v": jnp.zeros((cfg.n_layers, batch, w, kvh, hd), cfg.dtype),
        "pos": jnp.zeros((), jnp.int32),
    }


# --------------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------------


def _norm(cfg: LMConfig, p: dict, x: jax.Array) -> jax.Array:
    xf = x.astype(f32)
    mean_sq = _det_mean_sq if cfg.det8 else (
        lambda v: jnp.mean(v * v, axis=-1, keepdims=True))
    rsqrt = det_rsqrt if cfg.det8 else jax.lax.rsqrt
    if cfg.norm == "rmsnorm":
        xf = xf * rsqrt(mean_sq(xf) + f32(cfg.norm_eps))
        return _act(cfg, xf * p["scale"].astype(f32))
    mean = _det_mean(xf) if cfg.det8 else jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    xf = xc * rsqrt(mean_sq(xc) + f32(cfg.norm_eps))
    return _act(cfg, xf * p["scale"].astype(f32) + p["bias"].astype(f32))


@functools.lru_cache(maxsize=16)
def _rope_table(max_seq: int, hd: int, theta: float):
    """Host-precomputed RoPE tables [max_seq, hd//2] (float64 -> f32). Used
    by det8: the values enter the graph as constants, so no device trig runs
    and the bits cannot depend on how a shape vectorizes."""
    half = hd // 2
    fr = np.exp(np.arange(half, dtype=np.float64) * (-np.log(float(theta)) * 2.0 / hd))
    ang = np.arange(max_seq, dtype=np.float64)[:, None] * fr[None, :]
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _rope(cfg: LMConfig, x: jax.Array, positions: jax.Array) -> jax.Array:
    """Rotary embedding. x: [B, S, H, Dh]; positions: [S] int32."""
    hd = x.shape[-1]
    half = hd // 2
    if cfg.det8:
        tc, ts = _rope_table(max(cfg.max_seq, cfg.rope_positions), hd,
                             cfg.rope_theta)
        cos = jnp.take(jnp.asarray(tc), positions, axis=0)[None, :, None, :]
        sin = jnp.take(jnp.asarray(ts), positions, axis=0)[None, :, None, :]
    else:
        freqs = jnp.exp(
            jnp.arange(0, half, dtype=f32) * (-jnp.log(f32(cfg.rope_theta)) * 2.0 / f32(hd))
        )
        ang = positions.astype(f32)[:, None] * freqs[None, :]  # [S, half]
        cos = jnp.cos(ang)[None, :, None, :]
        sin = jnp.sin(ang)[None, :, None, :]
    x1, x2 = x[..., :half].astype(f32), x[..., half:].astype(f32)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    if cfg.det8:
        return _act(cfg, out)  # explicit rounding (hazard #4, see _act)
    return out.astype(x.dtype)


# --------------------------------------------------------------------------
# det8: topology-invariant integer-reduction forward (cfg.det8)
#
# Why integers: a float matmul's bits depend on its accumulation ORDER, which
# XLA picks per output-tile shape — and tensor parallelism changes the tile
# shapes (measured: chunked-fixed-point partial sums over just the
# contraction-sharded dots still left ~1.5e-3 logit divergence across TP
# widths, because the OUTPUT-sharded projections re-tile too). Integer
# addition is associative, so moving every reduction to int32 makes the
# result independent of tiling/mesh. Elementwise float ops (exp, rsqrt,
# scaling) stay f32: they are value-dependent only.
#
# Quantization scheme (all scales derived via max(), itself order-invariant):
# - weights:      int8, one scale per output column (max over K);
# - activations:  "dual int8" = int16 precision as hi*256 + lo with hi, lo
#                 int8 (lo in [-128, 127], no correction term needed), one
#                 scale per row (max over K) -> two int8 matmuls, combined
#                 256*hi_dot + lo_dot in f32;
# - softmax:      exp() f32, denominator = int32 sum of round(exp * 2^sb);
# - norms:        sum-of-squares of int16-quantized rows accumulated as two
#                 int32 sums (sq >> s, sq & mask) recombined in f32.
# int8*int8 contractions accumulate exactly in int32 for K < 2^31/127^2
# (~133k), covering every preset. Cost: ~2x matmul work + on-the-fly weight
# quantization; this is an opt-in determinism mode, not the speed path.
# --------------------------------------------------------------------------


# Scale discipline for everything below (measured, scratch/det8_prim_probe*):
# XLA's algebraic simplifier canonicalizes scalar-literal constants out of
# broadcast multiply chains — (x*c)*t and (m*c1)*(m*c2) re-associate
# DIFFERENTLY across sharded graph variants, moving bits. So quantization
# scales are pure maxima (NO scalar factor inside); every static constant is
# folded into exactly one terminal multiply (feeding a round()/add, or as
# x*(t*c) with the scalar inside the right operand).


def _act(cfg: LMConfig, x: jax.Array) -> jax.Array:
    """Round an activation to the model dtype at an EXPLICIT rounding point.

    Float path: a plain cast. det8: activations stay f32-TYPED and round in
    value via ``lax.reduce_precision`` — the FOURTH measured XLA
    shape-invariance hazard (scratch/det8_dbg4.py): TPU XLA's
    excess-precision pass elides f32->bf16->f32 convert pairs and keeps
    fused bf16 intermediates at f32 SHAPE-DEPENDENTLY, so a 24-token chunk
    rounded its residual stream differently from 24 serial steps (the whole
    forward diverged from t=0 while every det primitive compared exact in
    isolation; bits matched under --xla_allow_excess_precision=false).
    ``reduce_precision`` is semantically a rounding op the pass must keep,
    which pins every det8 rounding point per-computation instead of via a
    process-global flag. KV-cache buffers still store cfg.dtype — the cast
    of a pre-rounded value is exact, so a position's K/V bits are identical
    whether read back from the cache or used fresh in its own chunk."""
    if cfg.det8:
        if cfg.dtype != jnp.float32:
            fi = jnp.finfo(cfg.dtype)
            return jax.lax.reduce_precision(x.astype(f32), fi.nexp, fi.nmant)
        return x.astype(f32)
    return x.astype(cfg.dtype)


def _q8(x: jax.Array, axis) -> tuple[jax.Array, jax.Array]:
    """int8 quantization of f32 ``x`` with one scale-free max per slice
    along ``axis`` (the contraction axis): x ~= q * s / 127, |q| <= 127."""
    s = jnp.maximum(jnp.max(jnp.abs(x), axis=axis, keepdims=True), f32(1e-30))
    # pin the divide-then-scale grouping (the simplifier may otherwise fold
    # it to x * (127/s) with different rounding in different programs — the
    # same cross-program hazard _w8_dot documents)
    q = jnp.round(jax.lax.optimization_barrier(x / s) * f32(127.0)).astype(jnp.int8)
    return q, s


W8_KEYS = ("wq", "wk", "wv", "wo", "w_up", "w_gate", "w_down")


def ensure_w8(cfg: LMConfig, params: dict) -> dict:
    """Pre-quantize dense projection weights for the w8 forward (idempotent:
    already-quantized trees pass through). Every W8_KEYS leaf and the output
    head become ``(int8 q, f32 per-output-column scale)`` tuples; embeddings
    stay float (gather, not matmul). One pass over the weights — amortized
    across every step of the wave that follows."""
    if not cfg.w8 or isinstance(params["layers"]["wq"], tuple):
        return params
    return _quantize_w8(cfg, params)


@functools.partial(jax.jit, static_argnums=0)
def _quantize_w8(cfg: LMConfig, params: dict) -> dict:
    def qw(w, axis):
        # fold the 1/127^2 dequant constant into the stored per-column
        # scale so _w8_dot's tail is ONE multiply — with the barrier that
        # pins the chain structurally, not just at tested shapes (the
        # hazard-#5 fix's review follow-up)
        q, s = _q8(w.astype(f32), axis=axis)
        return q, s * f32(1.0 / (127.0 * 127.0))

    p = dict(params)
    layers = dict(p["layers"])
    for k in W8_KEYS:
        if k in layers:
            layers[k] = qw(layers[k], axis=1)  # [L, K, N]: over K
    p["layers"] = layers
    wh = p["embed"][: cfg.vocab].T if cfg.tie_embeddings else p["head"]
    p["head"] = qw(wh, axis=0)
    return p


def _w8_dot(x: jax.Array, wq: jax.Array, ws: jax.Array) -> jax.Array:
    """x [..., K] x int8 weights [K, N] (scales ws [1, N]) -> f32 [..., N].
    Activations quantize per row on the fly; int8 x int8 accumulates in
    int32 on the MXU (exact for K < 2^31/127^2 ~ 133k, every preset). The
    int8 weight array is what the step reads from HBM — half the bf16
    bytes, which is the measured per-step bound at 1B+ scale.

    The dequant scale chain is grouping-PINNED: encoder and decoder embed
    this dot in different programs (gather vs cdf-search consumers), and
    XLA's simplifier regrouped the ``acc * sx * (ws * c)`` multiply chain
    differently between the two at some graph shapes — measured: TinyLlama
    w8 + cache_grow at B=128 decoded garbage from position 0 while
    GPT-2/7B/8B shapes agreed (measurements/r4_tinyllama_mismatch.log; the
    same hazard class det8 documents in DESIGN.md §6). The 1/127^2 dequant
    constant is folded into ``ws`` at quantize time (_quantize_w8), so the
    expression here is barrier(acc*sx) * ws — a single multiply each side
    of the barrier with nothing left to regroup; identical inputs give
    identical bits in ANY program."""
    xq, sx = _q8(x.astype(f32), -1)
    acc = jnp.einsum("...k,kn->...n", xq, wq, preferred_element_type=jnp.int32)
    return jax.lax.optimization_barrier(acc.astype(f32) * sx) * ws


def _dual16(x: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """int16-precision dual-int8 row quantization over the LAST axis:
    x ~= (256*hi + lo) * s / 32512 with hi in [-127,127], lo in [-128,127]."""
    s = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), f32(1e-30))
    q = jnp.round((x / s) * f32(32512.0)).astype(jnp.int32)  # 127 * 256
    hi = (q + 128) >> 8  # round-to-nearest high byte
    lo = q - (hi << 8)
    return hi.astype(jnp.int8), lo.astype(jnp.int8), s


_DUAL_K = 1.0 / (32512.0 * 127.0)  # dequant constant of a dual16 x q8 dot


def _dual_einsum(eq: str, hi, lo, q8) -> jax.Array:
    """The two int8 contractions of a dual-int8 operand, recombined in f32
    as ``dhi * 256 + dlo`` — the product is a power-of-two scaling (EXACT in
    f32), so the expression is one correctly-rounded add whose bits cannot
    depend on whether the backend contracts it into an FMA. (The previous
    ``dhi*c1 + dlo*c2`` form with non-pow2 constants was measured to move
    bits BETWEEN SHAPES on the CPU backend: FMA contraction of the first
    product is vectorization-dependent — the third XLA hazard, found by the
    chunked-encode equality tests.) Callers fold the _DUAL_K dequant
    constant into their terminal tensor-scale multiply, the measured-safe
    ``x * (tensor * const)`` pattern (scale discipline note above)."""
    dhi = jnp.einsum(eq, hi, q8, preferred_element_type=jnp.int32)
    dlo = jnp.einsum(eq, lo, q8, preferred_element_type=jnp.int32)
    return dhi.astype(f32) * f32(256.0) + dlo.astype(f32)


def _det_dot8(x: jax.Array, w: jax.Array) -> jax.Array:
    """x [..., K] @ w [K, N] -> f32 [..., N] with integer accumulation."""
    hi, lo, sx = _dual16(x.astype(f32))
    w8, sw = _q8(w.astype(f32), axis=0)  # sw [1, N]
    return _dual_einsum("...k,kn->...n", hi, lo, w8) * (sx * (sw * f32(_DUAL_K)))


def _det_softmax(scores: jax.Array, cap: int | None = None) -> jax.Array:
    """Softmax over the last axis with an integer denominator (masked
    entries arrive as -inf and contribute exactly zero). ``cap`` pins the
    quantization exponent to a fixed axis capacity so different score-axis
    lengths over the same valid set give the same bits (chunked vs serial
    stepping — see int_sum_pow2)."""
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = det_exp(scores - m)
    ei, tot, _ = int_sum_pow2(e, cap)
    return ei.astype(f32) / tot.astype(f32)


def _det_mean_sq(x: jax.Array) -> jax.Array:
    """Deterministic mean-of-squares over the last axis: int16 row
    quantization, squares split into two int32 accumulators."""
    d = x.shape[-1]
    s = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), f32(1e-30))
    q = jnp.round((x / s) * f32(32767.0)).astype(jnp.int32)
    sq = q * q  # <= 2^30
    shift = max(12, ceil_log2(d) - 1)  # sum(sq>>shift) and sum(sq&mask) fit int32
    cc = 1.0 / (32767.0 * 32767.0 * d)  # static dequant constant, folded once
    hi = jnp.sum(sq >> shift, axis=-1, keepdims=True).astype(f32)
    lo = jnp.sum(sq & ((1 << shift) - 1), axis=-1, keepdims=True).astype(f32)
    # pow2 combine (exact product -> FMA-invariant add), then one terminal
    # multiply with the constant inside the tensor operand (scale discipline)
    t = hi * f32(float(1 << shift)) + lo
    return t * ((s * s) * f32(cc))


def _det_mean(x: jax.Array) -> jax.Array:
    """Deterministic mean over the last axis (int16 row quantization)."""
    d = x.shape[-1]
    s = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), f32(1e-30))
    q = jnp.round((x / s) * f32(32767.0)).astype(jnp.int32)
    return jnp.sum(q, axis=-1, keepdims=True).astype(f32) * (s * f32(1.0 / (32767.0 * d)))


def _det_scores(eq: str, qg: jax.Array, kv: jax.Array) -> jax.Array:
    """Attention scores with integer accumulation: qg [b,s,k,r,d] (dual-int8
    rows over d), kv [b,j,k,d] (int8 rows over d) -> f32 [b,k,r,s,j]."""
    hi, lo, sq = _dual16(qg.astype(f32))
    k8, sk = _q8(kv.astype(f32), axis=-1)
    dots = _dual_einsum(eq, hi, lo, k8)
    sq_t = jnp.transpose(sq, (0, 2, 3, 1, 4))                          # [b,k,r,s,1]
    sk_t = jnp.transpose(sk[..., 0], (0, 2, 1))[:, :, None, None, :]   # [b,k,1,1,j]
    return dots * sq_t * (sk_t * f32(_DUAL_K))


def _det_v8(v: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-ROW int8 quantization of V: one scale per (b, j, k) over d.
    Row-local, so a position's quantized V is the same whether the row sits
    in the fresh block or in the KV cache — the property that makes chunked
    encode bit-identical to serial decode (runtime.lm_engine)."""
    vf = v.astype(f32)
    sv = jnp.maximum(jnp.max(jnp.abs(vf), axis=-1, keepdims=True), f32(1e-30))
    v8 = jnp.round((vf / sv) * f32(127.0)).astype(jnp.int8)
    return v8, sv


def _fold_v_scales(probs: jax.Array, sv: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fold V's per-row scales into the probabilities BEFORE their dual-int8
    quantization (probs [b,k,r,s,j] * sv [b,j,k,1] -> dual16 over j). The
    contraction's per-j dequant factor thereby cancels exactly, leaving only
    probs' own row scale — which depends on the VALUE SET of the row, not on
    which buffer (cache vs fresh) supplies each j."""
    sv_t = jnp.transpose(sv[..., 0], (0, 2, 1))[:, :, None, None, :]  # [b,k,1,1,j]
    return _dual16(probs * sv_t)


def _det_attn_out(eq: str, probs: jax.Array, v: jax.Array) -> jax.Array:
    """probs [b,k,r,s,j] x v [b,j,k,d] -> f32 [b,s,k,r,d] with integer
    accumulation; V quantized per row (_det_v8), its scales folded into
    probs (_fold_v_scales) so every per-term dequant is j-invariant."""
    v8, sv = _det_v8(v)
    hi, lo, sp = _fold_v_scales(probs, sv)
    out = _dual_einsum(eq, hi, lo, v8)
    return out * (jnp.transpose(sp, (0, 3, 1, 2, 4)) * f32(_DUAL_K))  # [b,s,k,r,1]


def _det_attn_out_cached(probs: jax.Array, cv: jax.Array, v: jax.Array) -> jax.Array:
    """Cache-route attention output: probs [b,k,r,s,W+s] over the
    concatenated [cache | fresh block] score axis, cv [b,W,k,d], v
    [b,s,k,d] -> f32 [b,s,k,r,d].

    Bit-identical to ``_det_attn_out`` on a physical concat of [cv | v]
    WITHOUT materializing it: probs are quantized jointly (one row scale
    over the full axis), then the int32 contraction splits associatively
    into a cache einsum plus a fresh einsum whose partial sums are added in
    int32 — integer addition is associative, so the split cannot move bits.
    This is what lets the engine encode s-token chunks against the graph
    the decoder steps serially (same positions -> same bits)."""
    w = cv.shape[1]
    v8c, svc = _det_v8(cv)
    v8f, svf = _det_v8(v)
    hi, lo, sp = _fold_v_scales(probs, jnp.concatenate([svc, svf], axis=1))
    i32 = jnp.int32
    dhi = (
        jnp.einsum("bkrsw,bwkd->bskrd", hi[..., :w], v8c, preferred_element_type=i32)
        + jnp.einsum("bkrsj,bjkd->bskrd", hi[..., w:], v8f, preferred_element_type=i32)
    )
    dlo = (
        jnp.einsum("bkrsw,bwkd->bskrd", lo[..., :w], v8c, preferred_element_type=i32)
        + jnp.einsum("bkrsj,bjkd->bskrd", lo[..., w:], v8f, preferred_element_type=i32)
    )
    out = dhi.astype(f32) * f32(256.0) + dlo.astype(f32)  # pow2: FMA-invariant
    return out * (jnp.transpose(sp, (0, 3, 1, 2, 4)) * f32(_DUAL_K))


# Training-only fused-attention implementation selector (probed on-chip in
# measurements/r5_train_profile*.log; training scripts may override).
#   impl: "bf16s" (exact structure, bf16 score/prob materialization +
#         post-PV normalize — the measured winner, 75.8k vs 58.6k tok/s
#         baseline at byte-20l shapes) | "flash" | "splash"
#   flash_bs / splash_bs: optional kernel BlockSizes overrides
_FUSED = {"impl": "bf16s", "flash_bs": None, "splash_bs": None}


def _splash_prefill(cfg: LMConfig, qg, k, v):
    """Causal prefill via the splash-attention kernel (training-only)."""
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as _sk,
        splash_attention_mask as _sm,
    )

    b, s, kvh, rep, hd = qg.shape
    h = kvh * rep
    qf = qg.reshape(b, s, h, hd).transpose(0, 2, 1, 3) * (1.0 / float(hd) ** 0.5)
    kf = k.transpose(0, 2, 1, 3)
    vf = v.transpose(0, 2, 1, 3)
    mask = _sm.MultiHeadMask([_sm.CausalMask((s, s)) for _ in range(h)])
    kernel = _sk.make_splash_mha_single_device(
        mask=mask, block_sizes=_FUSED["splash_bs"])
    out = jax.vmap(kernel)(qf, kf, vf)
    return out.transpose(0, 2, 1, 3).astype(cfg.dtype).reshape(b, s, kvh, rep, hd)


def _bf16s_prefill(cfg: LMConfig, qg, k, v, scale):
    """Exact-structure causal prefill with model-dtype score materialization
    (training-only). Two levers vs the exact branch: (1) scores and the
    exp() tensor are stored in cfg.dtype, halving the dominant [B,H,S,S]
    HBM traffic; (2) the softmax normalization divides AFTER the PV
    contraction (per-row scalar), so no normalized-probability tensor is
    ever written."""
    b, s, kvh, rep, hd = qg.shape
    sf = jnp.einsum("bskrd,bjkd->bkrsj", qg, k,
                    preferred_element_type=f32).astype(cfg.dtype)
    sf = sf * scale.astype(cfg.dtype)
    i_ids = jnp.arange(s, dtype=jnp.int32)[None, None, None, :, None]
    j_ids = jnp.arange(s, dtype=jnp.int32)[None, None, None, None, :]
    sf = jnp.where(j_ids <= i_ids, sf, jnp.asarray(-jnp.inf, cfg.dtype))
    m = jnp.max(sf, axis=-1, keepdims=True)
    e = jnp.exp((sf - m).astype(f32)).astype(cfg.dtype)
    ssum = jnp.sum(e.astype(f32), axis=-1, keepdims=True)  # [b,k,r,s,1]
    out = jnp.einsum("bkrsj,bjkd->bskrd", e, v, preferred_element_type=f32)
    return (out / jnp.transpose(ssum, (0, 3, 1, 2, 4))).astype(cfg.dtype)


def _flash_prefill(cfg: LMConfig, qg, k, v):
    """Fused causal attention for the TRAINING prefill (float path only).

    The exact prefill branch materializes the [B, H, S, S] f32 score tensor
    per layer (plus its softmax) — at B=64, S=1024 that is ~2.1 GB of HBM
    write+read per layer per pass, and the round-4 training profile showed
    it dominating the step. The Pallas flash kernel streams K/V blocks
    through VMEM with an online softmax, so scores never touch HBM.

    Numerics differ from the exact branch only in float summation order, so
    this path is TRAINING-ONLY (``forward(..., fused=True)``): the coding
    paths keep the exact branch and their bitstreams are unchanged.
    MHA only (rep folded == 1); callers guard."""
    from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention

    b, s, kvh, rep, hd = qg.shape
    qf = qg.reshape(b, s, kvh * rep, hd).transpose(0, 2, 1, 3)
    kf = k.transpose(0, 2, 1, 3)
    vf = v.transpose(0, 2, 1, 3)
    out = flash_attention(qf, kf, vf, causal=True,
                          sm_scale=1.0 / float(hd) ** 0.5,
                          block_sizes=_FUSED["flash_bs"])
    return out.transpose(0, 2, 1, 3).astype(cfg.dtype).reshape(b, s, kvh, rep, hd)


def _attention(cfg: LMConfig, p: dict, x: jax.Array, ck, cv, pos, prefill: bool,
               fused: bool = False):
    """One layer's attention against (read-only cache slice, fresh K/V).

    The cache is never written here: queries attend to the old cache
    entries (positions < ``pos``) and to this call's fresh K/V (causal
    within the block) under ONE softmax over the concatenated score axis —
    mathematically identical to writing K/V into the cache first, but the
    cache stays a read-only scan input so the stacked cache can be updated
    by a single outer dynamic_update_slice (see ``forward``).

    ``prefill=True`` asserts the cache is empty (pos==0) and skips the
    cache-side scores entirely — training and re-prime prefills would
    otherwise pay a fully-masked [S, W] score block.

    Returns (y, fresh_k, fresh_v)."""
    b, s, d = x.shape
    h, kvh, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim

    def proj(w, bias_name, out_heads):
        if cfg.det8:
            y = _det_dot8(x, p[w])
            if cfg.use_bias:
                y = y + p[bias_name].astype(f32)
            y = _act(cfg, y)
        elif cfg.w8:
            y = _w8_dot(x, *p[w])
            if cfg.use_bias:
                y = y + p[bias_name].astype(f32)
            y = y.astype(cfg.dtype)
        else:
            y = jnp.dot(x, p[w], preferred_element_type=f32).astype(cfg.dtype)
            if cfg.use_bias:
                y = y + p[bias_name]
        return y.reshape(b, s, out_heads, hd)

    q = proj("wq", "bq", h)
    k = proj("wk", "bk", kvh)
    v = proj("wv", "bv", kvh)

    positions = pos + jnp.arange(s, dtype=jnp.int32)
    if cfg.pos_embedding == "rope":
        q = _rope(cfg, q, positions)
        k = _rope(cfg, k, positions)

    # GQA without materializing repeated K/V: fold the query-head expansion
    # into the einsum as a grouped head axis. jnp.repeat of the cached K/V
    # ([B, W, H, Dh] per layer per step) was measured as the dominant HBM
    # traffic at TinyLlama-1.1B scale (~6GB/step at B=64).
    rep = h // kvh
    qg = q.reshape(b, s, kvh, rep, hd)
    scale = f32(1.0) / jnp.sqrt(f32(hd))
    def oproj(out):
        out = out.reshape(b, s, h * hd)
        if cfg.det8:
            y = _det_dot8(out, p["wo"])
            if cfg.use_bias:
                y = y + p["bo"].astype(f32)
            return _act(cfg, y)
        elif cfg.w8:
            y = _w8_dot(out, *p["wo"])
            if cfg.use_bias:
                y = y + p["bo"].astype(f32)
            return y.astype(cfg.dtype)
        y = jnp.dot(out, p["wo"], preferred_element_type=f32).astype(cfg.dtype)
        if cfg.use_bias:
            y = y + p["bo"]
        return y

    if prefill and fused and not cfg.det8 and h == kvh:
        if _FUSED["impl"] == "splash":
            return oproj(_splash_prefill(cfg, qg, k, v)), k, v
        if _FUSED["impl"] == "bf16s":
            return oproj(_bf16s_prefill(cfg, qg, k, v, scale)), k, v
        return oproj(_flash_prefill(cfg, qg, k, v)), k, v
    # fresh-block scores: causal within the block (exact -inf masking so
    # masked positions contribute exactly zero after softmax)
    if cfg.det8:
        # fold 1/sqrt(hd) into q BEFORE quantization (one scalar multiply;
        # a post-hoc `scores * scale` would form the (x*c)*t chain XLA
        # reassociates differently across sharded graph variants)
        qg = qg.astype(f32) * scale
        sf = _det_scores("bskrd,bjkd->bkrsj", qg, k)
    else:
        sf = jnp.einsum("bskrd,bjkd->bkrsj", qg, k, preferred_element_type=f32)
        sf = sf * scale
    i_ids = jnp.arange(s, dtype=jnp.int32)[None, None, None, :, None]
    j_ids = jnp.arange(s, dtype=jnp.int32)[None, None, None, None, :]
    sf = jnp.where(j_ids <= i_ids, sf, f32(-jnp.inf))
    if prefill:
        if cfg.det8:
            probs = _det_softmax(sf)
            out = _act(cfg, _det_attn_out("bkrsj,bjkd->bskrd", probs, v))
        else:
            probs = jax.nn.softmax(sf, axis=-1)
            out = jnp.einsum(
                "bkrsj,bjkd->bskrd", probs.astype(cfg.dtype), v,
                preferred_element_type=f32,
            ).astype(cfg.dtype)
    else:
        # bf16 einsum inputs with f32 accumulation: materializing f32 casts
        # of the cached K/V doubles the per-step HBM traffic (measured
        # dominant); window derives from the cache shape, not cfg.max_seq
        w_len = (ck[0] if cfg.kv8 else ck).shape[1]
        if cfg.det8:
            sc = _det_scores("bskrd,bwkd->bkrsw", qg, ck)  # qg pre-scaled above
        elif cfg.kv8:
            # int8 cache route: q quantized per row, int8 x int8 -> int32 on
            # the MXU, dequant by the two row scales + 1/sqrt(hd) at the end.
            # The whole-cache read is the per-step HBM floor; int8 halves it.
            ck8, cks = ck
            q8, sq = _q8(qg.astype(f32), -1)
            sci = jnp.einsum("bskrd,bwkd->bkrsw", q8, ck8,
                             preferred_element_type=jnp.int32)
            sq_t = jnp.transpose(sq, (0, 2, 3, 1, 4))                        # [b,k,r,s,1]
            sk_t = jnp.transpose(cks[..., 0], (0, 2, 1))[:, :, None, None, :]  # [b,k,1,1,w]
            # grouping-PINNED dequant (the hazard-#5 class, same treatment
            # as _w8_dot): encoder and decoder embed this chain in different
            # programs, and a free `acc * sq * sk * c` multiply chain is
            # exactly what the simplifier regrouped differently per program
            # at the TinyLlama w8 shapes. Fold the constant into the K-side
            # scale under one barrier, pin the acc*sq product under another
            # — what remains is a single multiply of two barrier outputs.
            skc = jax.lax.optimization_barrier(
                sk_t * (scale / f32(127.0 * 127.0)))
            sc = jax.lax.optimization_barrier(sci.astype(f32) * sq_t) * skc
        else:
            sc = jnp.einsum("bskrd,bwkd->bkrsw", qg, ck, preferred_element_type=f32)
            sc = sc * scale
        w_ids = jnp.arange(w_len, dtype=jnp.int32)[None, None, None, None, :]
        sc = jnp.where(w_ids < pos, sc, f32(-jnp.inf))
        if cfg.slide and s > 1:
            # ring-age mask: a chunked forward under slide freezes the cache
            # at chunk start ``pos``, but serial stepping evicts one slot per
            # step — chunk query i must NOT see the i oldest slots or chunked
            # bits diverge from serial decode. Slot w holds global index
            # t0-W + ((w - t0) mod W), so keep it for query i iff
            # ((w - t0) mod W) >= i. Exact no-op for i=0 and for chunks
            # inside the first window (callers split chunks at ring
            # boundaries so a chunk never wraps mid-write).
            age = jnp.mod(w_ids - pos, jnp.int32(w_len))
            q_ids = jnp.arange(s, dtype=jnp.int32)[None, None, None, :, None]
            sc = jnp.where(age >= q_ids, sc, f32(-jnp.inf))
        if cfg.det8:
            # cap=2*W pins the softmax quantization exponent across score-axis
            # lengths (W+s for any s <= W), and the cached attn-out splits the
            # int32 contraction associatively — together these make an s-token
            # chunk bit-identical to s serial steps at the same positions, the
            # contract behind the engine's chunked det8 encode
            probs = _det_softmax(
                jnp.concatenate([sc, sf], axis=-1), cap=2 * w_len
            )
            out = _act(cfg, _det_attn_out_cached(probs, cv, v))
        elif cfg.kv8:
            cv8, cvs = cv
            probs = jax.nn.softmax(jnp.concatenate([sc, sf], axis=-1), axis=-1)
            # fold V's per-row scales into the cache-side probabilities, then
            # quantize the probability rows: int8 x int8 out contraction
            sv_t = jnp.transpose(cvs[..., 0], (0, 2, 1))[:, :, None, None, :]  # [b,k,1,1,w]
            p8, sp = _q8(probs[..., :w_len] * sv_t, -1)
            oci = jnp.einsum("bkrsw,bwkd->bskrd", p8, cv8,
                             preferred_element_type=jnp.int32)
            # same pinning as the score dequant above: constant folded into
            # the row scale under a barrier, one terminal multiply left
            spc = jax.lax.optimization_barrier(
                jnp.transpose(sp, (0, 3, 1, 2, 4)) * f32(1.0 / (127.0 * 127.0)))
            outc = oci.astype(f32) * spc
            pf = probs[..., w_len:].astype(cfg.dtype)
            outf = jnp.einsum("bkrsj,bjkd->bskrd", pf, v, preferred_element_type=f32)
            out = (outc + outf).astype(cfg.dtype)
        else:
            probs = jax.nn.softmax(jnp.concatenate([sc, sf], axis=-1), axis=-1)
            pc = probs[..., :w_len].astype(cfg.dtype)
            pf = probs[..., w_len:].astype(cfg.dtype)
            out = (
                jnp.einsum("bkrsw,bwkd->bskrd", pc, cv, preferred_element_type=f32)
                + jnp.einsum("bkrsj,bjkd->bskrd", pf, v, preferred_element_type=f32)
            ).astype(cfg.dtype)
    return oproj(out), k, v


def _mlp(cfg: LMConfig, p: dict, x: jax.Array) -> jax.Array:
    if cfg.det8:
        up = _det_dot8(x, p["w_up"])
        if cfg.use_bias:
            up = up + p["b_up"].astype(f32)
        up = _act(cfg, up)
        if cfg.act == "silu_glu":
            gate = _det_dot8(x, p["w_gate"])  # un-rounded f32, as before
            up = _act(cfg, det_silu(gate) * up)
        else:
            up = _act(cfg, det_gelu_tanh(up))
        y = _det_dot8(up, p["w_down"])
        if cfg.use_bias:
            y = y + p["b_down"].astype(f32)
        return _act(cfg, y)
    if cfg.w8:
        up = _w8_dot(x, *p["w_up"])
        if cfg.use_bias:
            up = up + p["b_up"].astype(f32)
        if cfg.act == "silu_glu":
            up = jax.nn.silu(_w8_dot(x, *p["w_gate"])) * up
        else:
            up = jax.nn.gelu(up, approximate=True)
        y = _w8_dot(up.astype(cfg.dtype), *p["w_down"])
        if cfg.use_bias:
            y = y + p["b_down"].astype(f32)
        return y.astype(cfg.dtype)
    dot = lambda a, w: jnp.dot(a, w, preferred_element_type=f32)  # noqa: E731
    up = dot(x, p["w_up"]).astype(cfg.dtype)
    if cfg.use_bias:
        up = up + p["b_up"]
    if cfg.act == "silu_glu":
        gate = dot(x, p["w_gate"])
        up = (jax.nn.silu(gate) * up.astype(f32)).astype(cfg.dtype)
    else:
        up = jax.nn.gelu(up.astype(f32), approximate=True).astype(cfg.dtype)
    y = dot(up, p["w_down"]).astype(cfg.dtype)
    if cfg.use_bias:
        y = y + p["b_down"]
    return y


def forward(cfg: LMConfig, params: dict, tokens: jax.Array, cache: dict,
            prefill: bool = False, remat: bool = False, unroll: bool = True,
            fused: bool = False):
    """Run S tokens through the model starting at cache position ``pos``.

    tokens: [B, S] int32 (values in [0, vocab]; ``vocab`` = BOS row).
    Returns (logits [B, S, vocab] float32, updated cache). S=1 is the decode
    step; S=W is the (re)prime/prefill. Same function, same math, so the
    step schedule — not the call style — determines the computation.

    The layer stack runs as ONE ``lax.scan`` over stacked layer params and
    stacked cache slices (compile graph is O(1) in depth, not O(L) — the
    unrolled version wedged the XLA compiler beyond ~64 lanes at 1B scale),
    and the stacked KV cache updates via a single dynamic_update_slice.

    ``prefill=True``: promise that the cache is empty (pos must be 0) —
    skips the cache-side attention (an all-masked [S, W] score block).

    ``remat=True``: checkpoint (rematerialize) each layer for the backward
    pass — under the layer scan, autodiff otherwise saves every layer's
    attention probabilities ([B, H, S, W] f32 x L), which OOMs HBM at
    training shapes (measured 23GB at L=12, B=64, S=512); with remat only
    the inter-layer activations are saved and attention recomputes in the
    backward. Inference paths (no grads) leave it off.

    ``fused=True``: TRAINING-ONLY — route the float prefill attention
    through the Pallas flash kernel (``_flash_prefill``). Same math,
    different float summation order, so coding paths must not set it (the
    bitstream contract requires the exact branch on both sides).

    ``unroll=True`` (default): unroll the layer scan. The rolled loop
    defeats XLA's in-place aliasing/fusion across layers and measured
    2.7x slower decode steps (43k vs 119k tok/s, byte-12l B=256 on v5e);
    unrolled keeps the stacked layout and single cache write but gives the
    scheduler the whole depth. Training passes unroll=False (rolled +
    remat is the measured-safe memory configuration).
    """
    x = _act(cfg, params["embed"][tokens])  # [B, S, D]
    pos = cache["pos"]
    if prefill and not isinstance(pos, jax.core.Tracer) and int(pos) != 0:
        # enforce the documented precondition when the cache is concrete
        # (inside jit, pos is a tracer and the engine call sites are audited)
        raise ValueError("forward(prefill=True) requires an empty cache (pos==0)")
    if cfg.pos_embedding == "learned":
        s = tokens.shape[1]
        positions = pos + jnp.arange(s, dtype=jnp.int32)
        if cfg.det8:
            x = _act(cfg, x + params["pos_embed"][positions][None, :, :].astype(f32))
        else:
            x = x + params["pos_embed"][positions][None, :, :].astype(cfg.dtype)

    def layer_step(x, xs):
        if cfg.kv8:
            lp, ck8, cks, cv8, cvs = xs
            ck, cv = (ck8, cks), (cv8, cvs)
        else:
            lp, ck, cv = xs
        h, fk, fv = _attention(cfg, lp, _norm(cfg, lp["ln1"], x), ck, cv, pos,
                               prefill, fused=fused)
        # residual adds round explicitly under det8 (hazard #4, see _act);
        # the float path's bf16+bf16 add already rounds, cast is a no-op
        x = _act(cfg, x + h)
        x = _act(cfg, x + _mlp(cfg, lp, _norm(cfg, lp["ln2"], x)))
        return x, (fk, fv)

    body = jax.checkpoint(layer_step) if remat else layer_step
    if cfg.kv8:
        xs = (params["layers"], cache["k"], cache["ks"], cache["v"], cache["vs"])
    else:
        xs = (params["layers"], cache["k"], cache["v"])
    x, (fk, fv) = jax.lax.scan(body, x, xs, unroll=unroll)
    x = _norm(cfg, params["final_norm"], x)
    # model-dtype operands with f32 MXU accumulation: an explicit f32 cast of
    # the [D, V] head materializes ~260MB per step at 32k vocab and forces a
    # (slower) f32 matmul; bf16-in/f32-out is the hardware's native mode
    if cfg.w8:
        logits = _w8_dot(x, *params["head"])  # ensure_w8 materialized it
    else:
        wh = params["embed"][: cfg.vocab].T if cfg.tie_embeddings else params["head"]
        if cfg.det8:
            logits = _det_dot8(x, wh)
        else:
            logits = jnp.dot(
                x.astype(cfg.dtype), wh.astype(cfg.dtype), preferred_element_type=f32
            )
    # ONE stacked-cache write for all layers ([L, B, S, KVH, Dh] at pos);
    # indices share one dtype even under scoped x64 (a literal 0 would
    # weakly promote to int64 there while pos is int32)
    z = jnp.zeros((), jnp.int32)
    if cfg.slide:
        # ring buffer: the write cursor wraps modulo the cache width while
        # ``pos`` (and therefore RoPE positions and the validity mask) keeps
        # counting globally — reads happen above, before this write, so at
        # global step p the cache holds exactly tokens [p-W, p). S must not
        # wrap mid-write: engine callers step S=1 after the first window
        # (which starts at cursor 0).
        w_cache = cache["k"].shape[2]
        at = (z, z, pos % jnp.int32(w_cache), z, z)
    else:
        at = (z, z, pos, z, z)
    if cfg.kv8:
        # fresh K/V quantize per row at the cache write; the fresh-path
        # scores in _attention used the unquantized rows — encoder and
        # decoder replay the same serial graph, so the asymmetry is shared
        fk8, fks = _q8(fk.astype(f32), -1)
        fv8, fvs = _q8(fv.astype(f32), -1)
        new_cache = {
            "k": jax.lax.dynamic_update_slice(cache["k"], fk8, at),
            "ks": jax.lax.dynamic_update_slice(cache["ks"], fks, at),
            "v": jax.lax.dynamic_update_slice(cache["v"], fv8, at),
            "vs": jax.lax.dynamic_update_slice(cache["vs"], fvs, at),
            "pos": pos + jnp.int32(tokens.shape[1]),
        }
        return logits, new_cache
    # under det8 fresh K/V are f32-typed but pre-rounded to cfg.dtype values
    # (_act), so this cast is exact: cached bits == fresh bits per position
    fk, fv = fk.astype(cache["k"].dtype), fv.astype(cache["v"].dtype)
    new_cache = {
        "k": jax.lax.dynamic_update_slice(cache["k"], fk, at),
        "v": jax.lax.dynamic_update_slice(cache["v"], fv, at),
        "pos": pos + jnp.int32(tokens.shape[1]),
    }
    return logits, new_cache
