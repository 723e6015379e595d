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
# faster.  XLA:CPU entries are AOT-compiled for the BUILD machine's
# feature set and can SIGILL/segfault when loaded on a different host
# (this workspace persists across heterogeneous machines), so the dir
# is keyed by a host-CPU fingerprint on top of jax's backend/version
# keying — a new host recompiles instead of loading foreign artifacts.
from mpmavatar_tpu.utils import compile_cache

compile_cache.setup(cpu=True, min_compile_secs=1.0)
