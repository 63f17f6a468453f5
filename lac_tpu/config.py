"""Configuration layer: typed dataclasses behind every engine entry point.

The reference's only configuration surface is keyword defaults scattered
across functions (precision=48 at arithmetic_coding.py:10, prec=16 at
arith_code.py:145, model path/n_ctx/overlap at llama_compress.py:4-18 —
SURVEY.md §5 config row). Here every knob lives in one place, serializes to
the container's canonical-JSON config field, and maps 1:1 onto CLI flags.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field

__all__ = ["ByteCodingConfig", "LMCodingConfig", "MeshConfig", "from_dict"]


@dataclass(frozen=True)
class ByteCodingConfig:
    """Byte-alphabet coding (classical models; turbo or XLA-scan codecs)."""

    model_id: str = "order0n"     # order0n/order1n/order0c (fused Pallas) | order0 | markov1 ...
    block_size: int = 1 << 12     # bytes per independent block
    prob_bits: int = 16           # CDF quantization precision (2**prob_bits)
    rate: int = 4                 # adaptation rate base (turbo model)

    def engine_kwargs(self) -> dict:
        kw = {"model_id": self.model_id, "block_size": self.block_size,
              "prob_bits": self.prob_bits}
        if self.model_id in ("order0c", "order0n", "order1n", "order2n"):
            kw["rate"] = self.rate
        return kw


@dataclass(frozen=True)
class LMCodingConfig:
    """LM-predictor coding (transformer forward pass feeds the coder)."""

    model_ref: str = "prng:byte-12l:0"  # prng:<preset>:<seed> | hf:<path> | file:<path>
    block_tokens: int = 512             # tokens per independent block
    lanes: int = 64                     # batched streams per wave
    prob_bits: int = 16
    window: int | None = None           # sliding context window cap in tokens
    overlap: int = 2                    # window keep fraction denominator
    det8: bool = False                  # topology-invariant integer forward
    kv8: bool = False                   # int8 KV cache (float-path speed mode)
    w8: bool = False                    # int8 weights (W8A8 projections)
    cache_grow: int = 128               # KV-cache growth bucket (0 = fixed)
    window_mode: str = "auto"           # "auto" | "reprime" | "slide" — auto
                                        # resolves to slide when the model
                                        # supports it (containers record the
                                        # RESOLVED mode)
    slide_seg: int | None = None        # float slide scan-segment length
                                        # (None = engine default, 0 = legacy
                                        # single-scan graphs)

    def engine_kwargs(self) -> dict:
        """Keyword mapping for runtime.lm_api.lm_compress_bytes. ``window``
        caps the model context (max_seq): blocks longer than it re-prime on
        the reference's sliding-window schedule (llama_compress.py:31-39)."""
        return {
            "model_ref": self.model_ref,
            "block_tokens": self.block_tokens,
            "lanes": self.lanes,
            "prob_bits": self.prob_bits,
            "overlap": self.overlap,
            "max_seq": self.window,
            "det8": self.det8,
            "kv8": self.kv8,
            "w8": self.w8,
            "cache_grow": self.cache_grow,
            "window_mode": self.window_mode,
            "slide_seg": self.slide_seg,
        }


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh geometry for the distributed driver (SURVEY.md §5)."""

    data: int = -1    # -1: all remaining devices
    model: int = 1    # tensor-parallel span

    def make(self, devices=None):
        from .parallel.mesh import make_mesh

        return make_mesh(data=self.data, model=self.model, devices=devices)


def from_dict(cls, d: dict):
    """Build a config dataclass from a (container/CLI) dict, ignoring
    unknown keys — forward compatibility for old readers."""
    names = {f.name for f in dataclasses.fields(cls)}
    kw = {k: v for k, v in d.items() if k in names}
    # engine_kwargs/containers store the window cap under ``max_seq`` (the
    # model-context name used on the wire); map it back so LMCodingConfig
    # round-trips from header.config
    if cls is LMCodingConfig and "window" not in d and d.get("max_seq") is not None:
        kw["window"] = d["max_seq"]
    return cls(**kw)
