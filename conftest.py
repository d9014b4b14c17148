"""Repo-root pytest config: path setup + force a virtual 8-device CPU mesh.

Tests never touch the real TPU (the driver benches on it separately);
Pallas kernels run in interpret mode on CPU, and sharding tests use the
8 virtual CPU devices (SURVEY.md §4.4).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize pins jax_platforms to the TPU plugin; tests run on
# CPU regardless (must happen before any backend is initialized).
jax.config.update("jax_platforms", "cpu")
