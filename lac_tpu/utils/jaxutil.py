"""JAX helpers: scoped 64-bit mode and platform control.

The coder state is uint64; enabling x64 globally would flip default literal
dtypes to 64-bit and poison model code (f64 matmuls are emulated on TPU), so
64-bit mode is entered only around coder entry points.
"""

from __future__ import annotations

import functools

import jax

__all__ = ["x64", "force_cpu"]


def x64(fn):
    """Run ``fn`` (tracing and execution) under scoped 64-bit mode."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.enable_x64(True):
            return fn(*args, **kwargs)

    return wrapper


def force_cpu() -> None:
    """Force the CPU backend. Must run before backend initialization; the
    axon TPU plugin in this image ignores the JAX_PLATFORMS env var."""
    jax.config.update("jax_platforms", "cpu")
