"""Test env: CPU backend with 8 virtual devices (multi-chip sharding tests),
float64 enabled for tight oracle comparisons."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force via config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: on the 1-core CI host jit compiles
# dominate the suite's wall clock; a warmed cache cuts the quick tier
# severalfold across runs (cache key includes backend/flags, so the
# 8-virtual-device CPU programs here never collide with TPU entries).
# IN-REPO (gitignored), not /tmp: /tmp does not survive across driver
# runs, which is exactly how BENCH_r04 lost its warm cache.
from macaque_tpu.core.compile_cache import setup_compile_cache  # noqa: E402

setup_compile_cache(".jax_test_cache")
