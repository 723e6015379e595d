"""Fused-Pallas transfer kernels vs the XLA column path (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from test_substep_golden import make_cloth, build_pair

from mpmavatar_tpu.core import stepping
from mpmavatar_tpu.ops import column_transfer as ct
from mpmavatar_tpu.ops import pallas_transfer as pt


def _scene(nx=12, grid=64, K=16, cap=512):
    verts, faces = make_cloth(nx=nx, ny=nx, y0=1.1, extent=0.5)
    _, cfg, state, model = build_pair(verts, faces, E=500.0, n_grid=grid)
    vf_inc = jnp.asarray(ct.build_vertex_incidence(faces,
                                                   cfg.n_vertices))
    dt = 2e-4
    _, _, _, stress, vforce = stepping.compute_stress(cfg, state, model,
                                                      dt,
                                                      vf_incidence=vf_inc)
    sel = (state.selection == 0).astype(state.x.dtype)
    nnv = cfg.n_no_vertices
    sstress = dt * sel[:nnv, None, None] * stress
    svf = dt * vforce
    bins = ct.build_bins(state.x, cfg, K, c_cap=cap)
    assert int(bins.overflow) == 0
    return cfg, state, model, sstress, svf, bins, K


# radius 2 and bf16 run UNMARKED on a shrunk scene: both are supported
# knobs of the shipped fast path, so the default suite must exercise
# their parity (ADVICE r2 flagged them as slow-only)
_SMALL = dict(nx=7, grid=32, K=8, cap=128)


@pytest.mark.parametrize("radius,scene", [(1, {}), (2, _SMALL)])
def test_p2g_fused_matches_xla(radius, scene):
    cfg, state, model, sstress, svf, bins, K = _scene(**scene)
    gv_ref, gm_ref = ct.p2g_columns(cfg, state, sstress, svf, K,
                                    bins=bins, radius=radius)
    gv, gm = pt.p2g_columns_fused(cfg, state, sstress, svf, K, bins=bins,
                                  radius=radius, interpret=True)
    np.testing.assert_allclose(np.asarray(gm), np.asarray(gm_ref),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gv_ref),
                               atol=1e-6)


@pytest.mark.parametrize("radius,scene", [(1, {}), (2, _SMALL)])
def test_g2p_fused_matches_xla(radius, scene):
    cfg, state, model, sstress, svf, bins, K = _scene(**scene)
    gv, gm = ct.p2g_columns(cfg, state, sstress, svf, K, bins=bins,
                            radius=radius)
    grid_v_out = stepping.grid_update(cfg, model, gv, gm, 2e-4)
    ref = ct.g2p_columns(cfg, state, grid_v_out, K, bins=bins,
                         radius=radius)
    out = pt.g2p_columns_fused(cfg, state, grid_v_out, K, bins=bins,
                               radius=radius, interpret=True)
    for a, b, name in zip(out, ref, ("v", "C", "grad_v")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, err_msg=name)


def test_bf16_transfer_parity():
    """bf16 transfer mode: fused kernels vs the XLA column path, both in
    half precision — identical operand rounding, loose output tol."""
    cfg, state, model, sstress, svf, bins, K = _scene(**_SMALL)
    gv_ref, gm_ref = ct.p2g_columns(cfg, state, sstress, svf, K,
                                    bins=bins, bf16=True)
    gv, gm = pt.p2g_columns_fused(cfg, state, sstress, svf, K, bins=bins,
                                  bf16=True, interpret=True)
    np.testing.assert_allclose(np.asarray(gm), np.asarray(gm_ref),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gv_ref),
                               atol=1e-3)
    # bf16 stays a faithful approximation of the f32 transfer
    gv32, gm32 = ct.p2g_columns(cfg, state, sstress, svf, K, bins=bins)
    denom = max(1e-6, float(jnp.abs(gm32).max()))
    assert float(jnp.abs(gm - gm32).max()) / denom < 2e-2

    grid_v_out = stepping.grid_update(cfg, model, gv32, gm32, 2e-4)
    ref = ct.g2p_columns(cfg, state, grid_v_out, K, bins=bins, bf16=True)
    out = pt.g2p_columns_fused(cfg, state, grid_v_out, K, bins=bins,
                               bf16=True, interpret=True)
    for a, b, name in zip(out, ref, ("v", "C", "grad_v")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, err_msg=name)


@pytest.mark.slow
def test_full_frame_pallas_path():
    """End-to-end frame: pallas path matches the scatter path, including
    mesh collider + joint pinning (fused-mover kernel channels) +
    amortized rebinning, and stays differentiable."""
    import dataclasses
    from mpmavatar_tpu.sim import MPMSolver
    from bench import build_body_sphere
    verts, faces = make_cloth(nx=10, ny=10, y0=1.1, extent=0.5)
    _, cfg, state, model = build_pair(verts, faces, E=500.0, n_grid=64)
    cfg = dataclasses.replace(cfg, num_joint_v=6)
    bv, bf = build_body_sphere(n_theta=12, n_phi=12,
                               center=(1.0, 0.8, 1.0), r=0.25)
    mx, mv = jnp.asarray(bv), jnp.zeros((len(bv), 3), jnp.float32)
    jv = jnp.full((6, 3), 0.05, jnp.float32)

    def run(**kw):
        s = MPMSolver(cfg, column_k=16, mesh_column_k=16,
                      column_c_cap=512, faces=faces, **kw)
        s.add_surface_collider([0.0, 0.1, 0.0], [0.0, 1.0, 0.0])
        s.add_mesh_collider(bf, friction=0.5)
        s.add_particle_mover()
        st, _, of = s.frame(state, model, 1e-4, 8, 0.0, mesh_x=mx,
                            mesh_v=mv, joint_verts_v=jv,
                            return_overflow=True)
        assert int(of) == 0
        return np.asarray(st.x)

    # guard against silent flag-plumbing regressions: the pallas run
    # must actually invoke the fused kernels
    calls = {"n": 0}
    orig = pt._p2g_pallas

    def counted(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    x_ref = run()
    pt._p2g_pallas, n0 = counted, calls["n"]
    try:
        x_pal = run(column_pallas=True)
        assert calls["n"] > n0, "column_pallas did not reach the kernel"
        np.testing.assert_allclose(x_pal, x_ref, atol=1e-5)
        x_pal2 = run(column_pallas=True, column_radius=2, rebin_auto=True)
        np.testing.assert_allclose(x_pal2, x_ref, atol=1e-5)
    finally:
        pt._p2g_pallas = orig


@pytest.mark.slow
def test_pallas_path_gradients():
    """custom-VJP backward (XLA re-trace) matches the XLA path gradient."""
    from mpmavatar_tpu.sim import MPMSolver
    verts, faces = make_cloth(nx=7, ny=7, y0=1.1, extent=0.4)
    _, cfg, state, model = build_pair(verts, faces, E=500.0, n_grid=32)

    def loss_with(pallas):
        s = MPMSolver(cfg, column_k=16, column_c_cap=256, faces=faces,
                      column_pallas=pallas)

        def f(e_scalar):
            import dataclasses
            from mpmavatar_tpu.core.types import finalize_mu_lam
            m = finalize_mu_lam(dataclasses.replace(
                model, E=jnp.full_like(model.E, e_scalar)))
            st, _ = s.frame(state, m, 1e-4, 5, 0.0)
            return jnp.sum(st.x ** 2)
        return jax.value_and_grad(f)(jnp.float32(500.0))

    l_ref, g_ref = loss_with(False)
    l_pal, g_pal = loss_with(True)
    np.testing.assert_allclose(float(l_pal), float(l_ref), rtol=1e-6)
    np.testing.assert_allclose(float(g_pal), float(g_ref), rtol=1e-4)


def test_splat_fused_matches_xla():
    """splat_columns_fused (default mesh-collider splat on TPU) vs the
    XLA splat_columns, incl. out-of-bounds points and overflow counts."""
    import numpy as np
    from mpmavatar_tpu.core.types import MPMStaticConfig
    from mpmavatar_tpu.ops import column_transfer as ct
    from mpmavatar_tpu.ops import pallas_transfer as pt

    cfg = MPMStaticConfig(n_elements=0, n_traditional=10, n_vertices=0,
                          n_grid=32, grid_lim=2.0)
    rng = np.random.default_rng(0)
    pts = rng.uniform(0.1, 1.9, (400, 3)).astype(np.float32)
    pts[:5] = [[-0.1, 1.0, 1.0], [1.0, 2.1, 1.0], [1.95, 1.0, 1.0],
               [1.0, 1.0, -0.2], [0.02, 0.02, 0.02]]  # oob / boundary
    vals = rng.normal(size=(400, 6)).astype(np.float32)
    a_v, a_w, a_of = ct.splat_columns(cfg, jnp.asarray(pts),
                                      jnp.asarray(vals), 32)
    b_v, b_w, b_of = pt.splat_columns_fused(cfg, jnp.asarray(pts),
                                            jnp.asarray(vals), 32)
    np.testing.assert_allclose(np.asarray(b_v), np.asarray(a_v),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(b_w), np.asarray(a_w),
                               rtol=1e-5, atol=1e-6)
    assert int(a_of) == int(b_of)

    # tight caps: identical overflow accounting
    a_v, a_w, a_of = ct.splat_columns(cfg, jnp.asarray(pts),
                                      jnp.asarray(vals), 4, c_cap=16)
    b_v, b_w, b_of = pt.splat_columns_fused(cfg, jnp.asarray(pts),
                                            jnp.asarray(vals), 4,
                                            c_cap=16)
    assert int(a_of) == int(b_of) > 0
