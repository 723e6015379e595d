"""Pallas fused grid-update kernel vs the reference implementation
(interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from mpmavatar_tpu.core import stepping, types
from mpmavatar_tpu.ops.pallas_grid import grid_update_pallas


def test_pallas_grid_update_matches():
    rng = np.random.default_rng(0)
    n = 32 ** 3
    vin = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    m = jnp.asarray((rng.random(n) > 0.5).astype(np.float32)
                    * rng.random(n).astype(np.float32))
    cfg = types.MPMStaticConfig(n_elements=0, n_traditional=1,
                                n_vertices=0, n_grid=32)
    model = types.make_model(1, gravity=(0.0, -9.8, 0.0))
    ref = stepping.grid_update(cfg, model, vin, m, 1e-4)
    out = grid_update_pallas(vin, m, model.gravity, 1e-4,
                             float(model.grid_v_damping_scale),
                             interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pallas_grid_update_damping():
    rng = np.random.default_rng(1)
    n = 16 ** 3
    vin = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    m = jnp.ones((n,), jnp.float32)
    out_damped = grid_update_pallas(vin, m, jnp.zeros(3), 0.0, 0.9,
                                    interpret=True)
    out_plain = grid_update_pallas(vin, m, jnp.zeros(3), 0.0, 1.1,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(out_damped),
                               0.9 * np.asarray(out_plain), atol=1e-6)
