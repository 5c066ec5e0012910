"""Test configuration: run on a virtual 8-device CPU mesh with float64.

Multi-chip sharding is validated on `xla_force_host_platform_device_count=8`
CPU devices (no multi-chip TPU hardware in CI); numerical oracles run in
float64, mirroring the reference's double-precision core.

Note: the ambient environment may export JAX_PLATFORMS=axon (TPU tunnel) and
preload jax via sitecustomize, so we must override via jax.config *after*
import (still before backend initialization) rather than via env vars.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.devices()[0].platform == "cpu", (
    "tests must run on CPU; backend was initialized before conftest "
    f"could force it (got {jax.devices()})")
