"""Test configuration: force an 8-device virtual CPU mesh.

Tests never depend on real TPU hardware; sharding logic is exercised on
virtual CPU devices (the driver separately dry-runs the multi-chip path).
Must set XLA_FLAGS/JAX_PLATFORMS before jax initialises.
"""

import os

# Force CPU: the shell env carries JAX_PLATFORMS=axon (remote TPU tunnel),
# which would make every test pay remote-compile latency.  The axon plugin
# ignores the env var, so also pin it through jax.config (effective).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# note: device code is written int32-clean (k<=15 codes, <2Gb flat genomes);
# we intentionally do NOT enable x64.

# Persistent compilation cache: test time is dominated by XLA CPU compiles.
# The axon sitecustomize hook imports jax at interpreter start, so the env
# vars are read before conftest runs — set the config directly instead.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
