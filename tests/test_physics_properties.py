"""Physics property tests (SURVEY.md §4 plan items b):
rest-state equilibrium, stress symmetry, friction-cone behavior."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from mpmavatar_tpu.core import constitutive, linalg, stepping, types

from test_substep_golden import make_cloth, build_pair


def test_anisotropic_rest_state_zero_stress():
    """d == rest configuration => zero stress and zero vertex forces."""
    verts, faces = make_cloth(nx=6, ny=6)
    _, cfg, state, model = build_pair(verts, faces, E=500.0)
    stress, f1, f2, f3 = constitutive.anisotropic_stress(
        state.R_inv, state.d, state.vol[:cfg.n_elements],
        model.mu[:cfg.n_elements], model.lam[:cfg.n_elements],
        model.gamma[:cfg.n_elements], model.kappa[:cfg.n_elements])
    assert float(jnp.abs(stress).max()) < 1e-6
    assert float(jnp.abs(f1).max()) < 1e-6
    assert float(jnp.abs(f2).max()) < 1e-6
    assert float(jnp.abs(f3).max()) < 1e-6


def test_anisotropic_return_map_identity_at_rest():
    verts, faces = make_cloth(nx=6, ny=6)
    _, cfg, state, model = build_pair(verts, faces)
    d2 = constitutive.anisotropy_return_mapping(
        state.d, model.gamma[:cfg.n_elements], model.kappa[:cfg.n_elements],
        model.friction_coeff)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(state.d),
                               atol=1e-6)


def test_return_map_clamps_separation():
    """R33 > 1 (normal separation) is clamped back to contact."""
    verts, faces = make_cloth(nx=4, ny=4)
    _, cfg, state, model = build_pair(verts, faces)
    # stretch d3 beyond unit length
    d = state.d.at[:, :, 2].multiply(1.5)
    d2 = constitutive.anisotropy_return_mapping(
        d, model.gamma[:cfg.n_elements], model.kappa[:cfg.n_elements],
        model.friction_coeff)
    _, r = linalg.qr3_pos(d2)
    np.testing.assert_allclose(np.asarray(r[:, 2, 2]), 1.0, atol=1e-5)


def test_traditional_stress_symmetry():
    """The traditional-particle stress is symmetrized
    (mpm_utils.py:1103)."""
    rng = np.random.default_rng(0)
    n = 64
    cfg = types.MPMStaticConfig(n_elements=0, n_traditional=n,
                                n_vertices=0, n_grid=32, material=0)
    state = types.make_state(cfg, jnp.asarray(
        0.8 + 0.4 * rng.random((n, 3)), jnp.float32),
        vol=jnp.ones((n,)))
    f = jnp.asarray(np.eye(3) + 0.1 * rng.normal(size=(n, 3, 3)),
                    jnp.float32)
    state = dataclasses.replace(state, F_trial=f)
    model = types.make_model(n, E=100.0)
    _, _, _, stress, _ = stepping.compute_stress(cfg, state, model, 1e-4)
    np.testing.assert_allclose(np.asarray(stress),
                               np.asarray(jnp.swapaxes(stress, -1, -2)),
                               atol=1e-5)


def test_sand_cone_projection_expansive_flow():
    """Pure expansion (tr eps > 0, yielding) projects to the cone tip
    (F -> U V^T, mpm_utils.py:391-392)."""
    n = 8
    f = jnp.broadcast_to(jnp.eye(3) * 1.5, (n, 3, 3)).astype(jnp.float32)
    mu = jnp.full((n,), 40.0)
    lam = jnp.full((n,), 40.0)
    out = constitutive.sand_return_mapping(f, mu, lam, jnp.float32(0.3))
    np.testing.assert_allclose(np.asarray(out),
                               np.broadcast_to(np.eye(3), (n, 3, 3)),
                               atol=1e-5)


def test_von_mises_elastic_region_untouched():
    n = 8
    f = jnp.broadcast_to(jnp.eye(3) * 1.001, (n, 3, 3)).astype(jnp.float32)
    mu = jnp.full((n,), 10.0)
    lam = jnp.full((n,), 10.0)
    ys = jnp.full((n,), 1e3)
    out, ys2 = constitutive.von_mises_return_mapping(
        f, mu, lam, ys, jnp.float32(0.0), 0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(f), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ys2), np.asarray(ys))
