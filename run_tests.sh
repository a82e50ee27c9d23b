#!/bin/bash
# Test runner: force the clean CPU backend (8 virtual devices).
# NOTE: on hosts with a tunneled TPU plugin injected via PYTHONPATH
# (sitecustomize), the plugin must be stripped or concurrent processes can
# block at interpreter startup while a TPU job holds the tunnel.
cd "$(dirname "$0")"
PYTHONPATH="$(pwd)" JAX_PLATFORMS=cpu \
  XLA_FLAGS="--xla_force_host_platform_device_count=8" \
  python -m pytest tests/ -q "$@"
