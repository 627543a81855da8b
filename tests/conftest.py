"""Test configuration: force the JAX CPU backend with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware.

Note: this environment pre-sets JAX_PLATFORMS=axon (TPU tunnel) and its
site hooks re-assert it, so the env-var route is not reliable —
``jax.config.update`` after import (before backend init) is.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the suite is compile-bound (~20 min cold);
# warm re-runs skip most of it
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
