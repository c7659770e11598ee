"""Test env: force CPU backend with 8 virtual devices (SURVEY.md §4c).

The host sitecustomize pre-imports jax and pins jax_platforms="axon,cpu"
(a remote-TPU PJRT plugin), so env vars are too late — override via
jax.config before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the big jitted train/eval steps dominate
# suite wall-clock (a cold HRNet train-step compile is ~400s on CPU);
# caching them makes re-runs ~10x faster and is exactly what production
# TPU jobs do (jax_compilation_cache_dir on NFS/GCS).
_cache_dir = os.environ.get(
    "JAX_TEST_CACHE_DIR", os.path.expanduser("~/.cache/jax_test_compcache")
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

assert len(jax.devices()) == 8, (
    "expected 8 virtual CPU devices; a backend initialized before conftest"
)
