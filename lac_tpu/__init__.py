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

__version__ = "0.1.0"
