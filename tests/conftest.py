"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware.

Note: this environment preloads jax at interpreter startup with the TPU
plugin selected via JAX_PLATFORMS, so env vars are too late — switch via
jax.config before any backend is initialized."""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
