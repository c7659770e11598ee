#!/bin/bash
# Canonical test invocation: CPU backend with 8 virtual devices.
# (This host's sitecustomize pre-imports jax with JAX_PLATFORMS=axon, so the
# platform MUST be chosen via the environment before python starts —
# conftest.py is too late.)
cd "$(dirname "$0")"
JAX_PLATFORMS=cpu \
XLA_FLAGS="--xla_force_host_platform_device_count=8" \
exec python -m pytest tests/ -q "$@"
