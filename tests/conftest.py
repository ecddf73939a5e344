"""Test configuration: force an 8-device virtual CPU mesh.

Tests never depend on real TPU hardware; sharding logic is exercised on
virtual CPU devices (the driver separately dry-runs the multi-chip path).
Must set XLA_FLAGS/JAX_PLATFORMS before jax initialises.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")
