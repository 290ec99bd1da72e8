"""Test config: virtual 8-device CPU mesh + float64 for FD checks.

The container boots with JAX_PLATFORMS=axon (TPU tunnel) and imports jax
from sitecustomize before pytest starts, so env vars alone are ignored;
jax.config.update after import is the reliable override. XLA_FLAGS is read
lazily at backend init, which has not happened yet when conftest runs.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compile cache: the suite is dominated by XLA compiles of the
# rollout programs (each one scan-of-Newton-solves); caching them makes
# repeat runs start warm. Safe across platforms — keys include the target.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
