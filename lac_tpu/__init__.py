"""lacuna — TPU-native LLM arithmetic-coding compression framework.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
``pramasoul/lac`` (an LLM arithmetic compressor): a language model's
next-token distribution drives an entropy coder so compressed size approaches
the model's cross-entropy on the data.

Layers (bottom-up):

- ``utils``   — bit/byte framing, checksums, host helpers.
- ``ops``     — deterministic integer CDF quantization (the single principled
                replacement for the reference's three ad-hoc quantization
                guards, see reference arithmetic_coding.py:63-72,
                arith_code.py:83-93, llama_compress.py:29) and Pallas kernels.
- ``coder``   — entropy coders: a pure-Python arithmetic-coding oracle
                (semantics of reference arith_code.py:156-334 with its latent
                defects fixed), a NumPy rANS reference, and the batched
                JAX/Pallas rANS production path.
- ``models``  — the predictor zoo: classical adaptive models (reference
                arith_code.py:364-464) and JAX/Flax LM predictors (reference
                llama_compress.py:14-61).
- ``stream``  — the .lac container format (framing, block table, checksums).
- ``runtime`` — batched block scheduler and encode/decode engines.
- ``parallel``— mesh/sharding rules and the multi-host driver.
"""

__version__ = "0.2.0"

import os as _os

# Backend override: LAC_PLATFORM=cpu forces the CPU backend (some device
# plugins ignore the standard JAX_PLATFORMS env var; this applies the config
# knob before first backend use). Useful when the accelerator is held by
# another process (e.g. a training run) or for CI.
if _os.environ.get("LAC_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["LAC_PLATFORM"])

# Persistent XLA compilation cache: LM-scale encode/decode scans take minutes
# to compile on the TPU backend (remote-compiled through the axon tunnel);
# caching makes every shape a one-time cost across processes/sessions.
# Opt out (or redirect) with the standard JAX_COMPILATION_CACHE_DIR env var.
if "JAX_COMPILATION_CACHE_DIR" not in _os.environ:
    import jax as _jax

    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), ".jax_cache"),
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
