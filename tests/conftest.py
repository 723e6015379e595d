"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware.

Note: this environment preloads jax at interpreter startup with the TPU
plugin selected via JAX_PLATFORMS, so env vars are too late — switch via
jax.config before any backend is initialized."""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# persistent compile cache: the suite is compile-dominated (scans over
# substeps, shard_map programs); a warm cache runs it several times
# faster.  Keyed by backend+jaxlib version, so it stays correct across
# upgrades.
_cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
