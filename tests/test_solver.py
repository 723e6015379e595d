"""Solver-level tests: scanned rollouts, cloth-drop sanity, autodiff."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mpmavatar_tpu.core import stepping, types
from mpmavatar_tpu.sim import MPMSolver, set_E_nu, reset_density

from test_substep_golden import make_cloth, build_pair


def _setup(E=200.0):
    verts, faces = make_cloth(nx=6, ny=6, y0=1.2, extent=0.5)
    _, cfg, state, model = build_pair(verts, faces, E=E)
    solver = MPMSolver(cfg)
    solver.add_surface_collider([0.0, 0.4, 0.0], [0.0, 1.0, 0.0],
                                surface="sticky")
    return solver, state, model


def test_scan_frame_equals_substep_loop():
    solver, state, model = _setup()
    dt = 2e-4
    s_loop = state
    for s in range(8):
        s_loop = solver.substep(s_loop, model, dt, s * dt)
    s_scan, t = solver.frame(state, model, dt, 8, 0.0)
    np.testing.assert_allclose(np.asarray(s_scan.x), np.asarray(s_loop.x),
                               atol=1e-6)
    assert abs(float(t) - 8 * dt) < 1e-7


@pytest.mark.slow
def test_cloth_drop_settles_on_floor():
    solver, state, model = _setup()
    dt = 5e-4
    for _ in range(10):   # 10 frames x 50 substeps = 0.25 s of fall
        state, _ = solver.frame(state, model, dt, 50, 0.0)
    y = np.asarray(state.x)[:, 1]
    # free fall: 0.5 * 9.8 * 0.25^2 = 0.30 drop from 1.2; the sticky floor
    # at 0.4 is not reached yet and nothing tunnels or blows up
    assert 0.8 < y.mean() < 1.0
    assert y.min() > 0.39
    assert np.all(np.isfinite(np.asarray(state.x)))


def test_gradients_through_rollout():
    """jax.grad through the scanned rollout wrt E and density — replaces
    the reference's finite-difference probes
    (train_material_params.py:583-655)."""
    solver, state0, model0 = _setup()
    dt = 2e-4
    target = np.asarray(state0.x[solver.cfg.n_elements:]) - \
        np.array([0.0, 0.05, 0.0])

    def loss_fn(log_E, density):
        model = set_E_nu(model0, E=jnp.exp(log_E))
        state = reset_density(state0, density)
        state, _ = solver.frame(state, model, dt, 20, 0.0, remat=True)
        verts = state.x[solver.cfg.n_elements:]
        return jnp.mean((verts - target) ** 2)

    g = jax.grad(loss_fn, argnums=(0, 1))(jnp.float32(np.log(200.0)),
                                          jnp.float32(1.0))
    assert np.all(np.isfinite(np.asarray(g[0])))
    assert np.all(np.isfinite(np.asarray(g[1])))
    # E gradient must be nonzero: stiffness affects the fall
    assert abs(float(g[0])) > 0


def test_grad_matches_finite_difference():
    """Prestretched cloth: elastic stress is active from the first substep,
    so d(loss)/dE is significant; autodiff must agree with central FD."""
    verts, faces = make_cloth(nx=6, ny=6, y0=1.2, extent=0.5)
    _, cfg, state0, model0 = build_pair(verts, faces, E=200.0)
    # stretch positions 8% in-plane around the center; rest metric (R_inv)
    # stays at the unstretched geometry -> nonzero in-plane strain
    center = np.array([1.0, 1.2, 1.0], np.float32)
    stretched = (verts - center) * np.array([1.08, 1.0, 1.08]) + center
    d_s, _, _, _ = types.cloth_geometry(
        jnp.asarray(stretched, jnp.float32), jnp.asarray(faces))
    x_s = jnp.concatenate(
        [jnp.asarray(stretched, jnp.float32)[faces].mean(1),
         jnp.asarray(stretched, jnp.float32)], 0)
    state0 = dataclasses.replace(state0, x=x_s, d=d_s)
    solver = MPMSolver(cfg)
    dt = 2e-4
    target = np.asarray(state0.x[cfg.n_elements:])

    def loss_fn(E):
        model = set_E_nu(model0, E=E)
        state, _ = solver.frame(state0, model, dt, 15, 0.0, remat=True)
        return jnp.mean((state.x[cfg.n_elements:] - target) ** 2)

    g = float(jax.grad(loss_fn)(jnp.float32(200.0)))
    eps = 4.0
    fd = (float(loss_fn(jnp.float32(200.0 + eps)))
          - float(loss_fn(jnp.float32(200.0 - eps)))) / (2 * eps)
    assert np.isfinite(g) and np.isfinite(fd)
    assert abs(g) > 0
    denom = max(abs(g), abs(fd))
    assert abs(g - fd) / denom < 0.2, (g, fd)


def test_validate_state_and_cfl():
    from mpmavatar_tpu.sim.solver import validate_state, cfl_dt
    solver, state, model = _setup()
    assert validate_state(state) == {}
    bad = dataclasses.replace(
        state, v=state.v.at[0, 0].set(jnp.nan))
    rep = validate_state(bad)
    assert rep.get("v") == 1
    assert cfl_dt(state, solver.cfg) > 0

    # the driver-facing wrapper raises with a useful message
    import pytest
    solver.check_finite(state, context="healthy")  # no raise
    with pytest.raises(FloatingPointError, match="frame 3"):
        solver.check_finite(bad, context="simulate frame 3")


def test_unstable_rollout_fails_loud():
    """An unstable config (dt far past CFL for this stiffness) must raise
    via check_finite instead of silently producing NaN trajectories —
    the failure mode VERDICT r2 flagged for the stage-4/demo loops."""
    import pytest
    from test_substep_golden import make_cloth, build_pair
    from mpmavatar_tpu.sim import MPMSolver

    verts, faces = make_cloth(nx=6, ny=6, y0=1.0, extent=0.4)
    _, cfg, state, model = build_pair(verts, faces, E=5e4, n_grid=32)
    solver = MPMSolver(cfg)
    dt = 5e-3  # cfl-unstable on purpose (stable would be ~1e-4)
    with pytest.raises(FloatingPointError, match="unstable"):
        t = 0.0
        for i in range(6):
            state, t = solver.frame(state, model, dt, 20, t)
            solver.check_finite(state, context=f"frame {i}")


def test_set_parameters_in_box():
    """Region-box E/nu/density override (apply_additional_params,
    mpm_utils.py:1175-1193): only particles inside the box change."""
    import sys
    sys.path.insert(0, "tests")
    from test_substep_golden import make_cloth, build_pair
    from mpmavatar_tpu.sim import set_parameters_in_box
    verts, faces = make_cloth(nx=6, ny=6, y0=1.1, extent=0.5)
    _, cfg, state, model = build_pair(verts, faces, E=200.0)
    model2, state2 = set_parameters_in_box(
        model, state, point=[1.0, 1.1, 1.0], size=[0.1, 0.2, 0.1],
        E=900.0, nu=0.45, density=2.5)
    x = np.asarray(state.x)
    inside = np.all(np.abs(x - np.array([1.0, 1.1, 1.0]))
                    < np.array([0.1, 0.2, 0.1]), -1)
    assert inside.any() and not inside.all()
    E2 = np.asarray(model2.E)
    np.testing.assert_allclose(E2[inside], 900.0)
    np.testing.assert_allclose(E2[~inside], np.asarray(model.E)[~inside])
    # mu/lam refreshed to match new E inside
    mu_expect = 900.0 / (2.0 * (1.0 + 0.45))
    np.testing.assert_allclose(np.asarray(model2.mu)[inside], mu_expect,
                               rtol=1e-6)
    d2 = np.asarray(state2.density)
    np.testing.assert_allclose(d2[inside], 2.5)
    np.testing.assert_allclose(np.asarray(state2.mass),
                               d2 * np.asarray(state.vol))


@pytest.mark.slow
def test_rebin_auto_matches_exact():
    """Drift-based adaptive rebinning (rebin_auto) is exact while drift
    stays under the radius bound."""
    import sys
    sys.path.insert(0, "tests")
    from test_substep_golden import make_cloth, build_pair
    from mpmavatar_tpu.sim import MPMSolver
    verts, faces = make_cloth(nx=7, ny=7, y0=1.1, extent=0.5)
    _, cfg, state, model = build_pair(verts, faces, E=200.0)

    def run(**kw):
        s = MPMSolver(cfg, column_k=64, faces=faces, **kw)
        st, _ = s.frame(state, model, 2e-4, 16, 0.0)
        return np.asarray(st.x)

    a = run()
    b = run(column_radius=2, rebin_auto=True)
    np.testing.assert_allclose(b, a, atol=1e-7)


def test_adaptive_row_cap():
    """adapt_row_cap sizes the cap to the scene (+headroom) from the
    ladder and the adapted frame still matches the scatter path."""
    from test_substep_golden import make_cloth, build_pair
    from mpmavatar_tpu.ops import column_transfer as ct
    from mpmavatar_tpu.sim import MPMSolver

    verts, faces = make_cloth(nx=12, ny=12, y0=1.1, extent=0.5)
    _, cfg, state, model = build_pair(verts, faces, E=300.0)
    s = MPMSolver(cfg, column_k=8, faces=faces)
    cap = s.adapt_row_cap(state)
    rows = int(ct.count_rows(state.x, cfg, 8))
    assert cap in MPMSolver._CAP_LADDER
    assert rows < cap <= max(2 * int(rows * 1.35), 1536)
    st, _, of = s.frame(state, model, 2e-4, 6, 0.0, return_overflow=True)
    assert int(of) == 0
    s0 = MPMSolver(cfg, column_k=0)
    st0, _ = s0.frame(state, model, 2e-4, 6, 0.0)
    np.testing.assert_allclose(np.asarray(st.x), np.asarray(st0.x),
                               atol=1e-5)
