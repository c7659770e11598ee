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

assert len(jax.devices()) == 8, (
    "expected 8 virtual CPU devices; a backend initialized before conftest"
)
