"""Fused plane-form stress kernel vs the (E,3,3) reference path."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from test_substep_golden import make_cloth, build_pair

from mpmavatar_tpu.core import stepping
from mpmavatar_tpu.ops.pallas_stress import cloth_stress_fused


def _scene(bend=True):
    verts, faces = make_cloth(nx=9, ny=9, y0=1.1, extent=0.5)
    _, cfg, state, model = build_pair(verts, faces, E=500.0)
    if bend:
        # deform d so the return map's separated/slipping branches and a
        # non-trivial QR all get exercised
        rng = np.random.default_rng(0)
        import dataclasses
        d = np.asarray(state.d)
        d = d + rng.normal(0, 0.02, d.shape).astype(np.float32)
        d[:, :, 2] *= rng.uniform(0.5, 1.6, (len(d), 1)).astype(np.float32)
        state = dataclasses.replace(state, d=jnp.asarray(d))
    return cfg, state, model


def test_stress_fused_matches_reference_path():
    cfg, state, model = _scene()
    ref = stepping.compute_stress(cfg, state, model, 1e-4)
    out = stepping.compute_stress(cfg, state, model, 1e-4, pallas=True)
    names = ("new_d", "new_F", "yield", "stress", "vertex_force")
    for a, b, n in zip(out, ref, names):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, err_msg=n)


def test_stress_fused_selection_mask():
    import dataclasses
    cfg, state, model = _scene()
    sel = np.zeros(cfg.n_particles, np.int32)
    sel[: cfg.n_elements // 2] = 1          # freeze half the elements
    state = dataclasses.replace(state, selection=jnp.asarray(sel))
    ref = stepping.compute_stress(cfg, state, model, 1e-4)
    out = stepping.compute_stress(cfg, state, model, 1e-4, pallas=True)
    np.testing.assert_allclose(np.asarray(out[3]), np.asarray(ref[3]),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                               atol=3e-5)


@pytest.mark.slow
def test_stress_fused_gradients():
    cfg, state, model = _scene()

    def loss(d, pallas):
        import dataclasses
        st = dataclasses.replace(state, d=d)
        _, _, _, stress, vf = stepping.compute_stress(cfg, st, model,
                                                      1e-4, pallas=pallas)
        return jnp.sum(stress ** 2) + jnp.sum(vf ** 2)

    g_ref = jax.grad(lambda d: loss(d, False))(state.d)
    g_pal = jax.grad(lambda d: loss(d, True))(state.d)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=2e-3, atol=2e-2)
