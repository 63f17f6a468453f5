"""Test harness config: force the CPU backend with 8 virtual devices so
sharding/mesh tests run without TPU hardware (SURVEY.md §4.4).

NOTE: in this image the axon TPU plugin ignores JAX_PLATFORMS, so the
platform must be forced via jax.config before any backend initialization.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
