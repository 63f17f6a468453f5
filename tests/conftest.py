"""Test harness config: force the CPU backend with 8 virtual devices so
sharding/mesh tests run without TPU hardware (SURVEY.md §4.4).

NOTE: in this image the axon TPU plugin ignores JAX_PLATFORMS, so the
platform must be forced via jax.config before any backend initialization.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

# CPU tests get their OWN persistent-cache dir, keyed by this host's CPU
# features: the shared .jax_cache holds CPU AOT artifacts from earlier
# harness hosts with different features (the loader warns "may lead to
# SIGILL"), and the harness does migrate the repo between hosts — a fixed
# dir would re-poison itself on the next migration.
def _cpu_cache_dir() -> str:
    import hashlib

    tag = "nocpuinfo"
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    tag = hashlib.sha256(
                        " ".join(sorted(line.split()[2:])).encode()
                    ).hexdigest()[:12]
                    break
    except OSError:
        pass
    return os.path.join(os.path.dirname(__file__), "..", f".jax_cache_cpu-{tag}")


os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cpu_cache_dir())

# The full suite compiles hundreds of executables in one process; LLVM's
# JIT plus jax arenas accumulate >65530 memory maps (the kernel default
# cap), after which mmap fails and XLA:CPU SEGFAULTS mid-compile (measured:
# the suite died at the same compile-heavy test at ~56k maps and climbing;
# single-file runs pass). Raise the cap best-effort when we have the
# privilege; harmless otherwise.
try:
    with open("/proc/sys/vm/max_map_count") as _f:
        if int(_f.read()) < 262144:
            with open("/proc/sys/vm/max_map_count", "w") as _g:
                _g.write("1048576")
except OSError:
    pass

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
