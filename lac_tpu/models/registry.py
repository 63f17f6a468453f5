"""Model registry: container ``model_id`` -> predictor implementations.

The decoder rebuilds the exact pipeline from (model_id, config) in the
container header — the config surface the reference never had (SURVEY.md §5
"config/flag system": its only configuration was keyword defaults)."""

from __future__ import annotations

from .functional import (
    MarkovCDF,
    MarkovDecay,
    MarkovScan,
    Order0CDF,
    Order0Decay,
    Order0NibCDF,
    Order0Scan,
    Order1NibCDF,
    Order2NibCDF,
    ScanModel,
)

_SCAN_MODELS = {
    "order0": Order0Scan,
    "markov1": MarkovScan,
    "order0d": Order0Decay,
    "markov1d": MarkovDecay,
    "order0c": Order0CDF,
    "markov1c": MarkovCDF,
    "order0n": Order0NibCDF,
    "order1n": Order1NibCDF,
    "order2n": Order2NibCDF,
}


def get_scan_model(model_id: str, prob_bits: int, vocab: int = 256, **kw) -> ScanModel:
    if model_id not in _SCAN_MODELS:
        raise KeyError(
            f"unknown model '{model_id}'; known: {sorted(_SCAN_MODELS)}"
        )
    return _SCAN_MODELS[model_id](vocab=vocab, prob_bits=prob_bits, **kw)


def model_config(model_id: str, **kw) -> dict:
    """Canonical config dict stored in the container for this model."""
    return {k: v for k, v in kw.items()}


def register_scan_model(model_id: str, cls) -> None:
    _SCAN_MODELS[model_id] = cls
