"""Column-packed MXU transfer path vs the reference scatter/gather path."""

import pytest
import dataclasses

import numpy as np
import jax.numpy as jnp

from mpmavatar_tpu.core import stepping, types
from mpmavatar_tpu.ops import column_transfer as ct

from test_substep_golden import make_cloth, build_pair


def _setup():
    verts, faces = make_cloth(nx=7, ny=7, y0=1.0, extent=0.5)
    _, cfg, state, model = build_pair(verts, faces, E=200.0)
    rng = np.random.default_rng(0)
    state = dataclasses.replace(
        state,
        v=jnp.asarray(rng.normal(0, 0.1, state.v.shape).astype(np.float32)),
        C=jnp.asarray(rng.normal(0, 0.5, state.C.shape).astype(np.float32)))
    dt = 1e-4
    new_d, new_f, new_ys, stress, vforce = stepping.compute_stress(
        cfg, state, model, dt)
    state = dataclasses.replace(state, d=new_d)
    return cfg, state, model, stress, vforce, dt


def test_p2g_columns_matches_scatter():
    cfg, state, model, stress, vforce, dt = _setup()
    gv_ref, gm_ref = stepping.p2g(cfg, state, model, stress, vforce, dt)

    sel = (state.selection == 0).astype(jnp.float32)
    gv, gm = ct.p2g_columns(cfg, state,
                            dt * sel[:cfg.n_no_vertices, None, None]
                            * stress,
                            dt * vforce, K=64)
    bins = ct.build_bins(state.x, cfg, 64)
    assert int(bins.overflow) == 0
    np.testing.assert_allclose(np.asarray(gm), np.asarray(gm_ref),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gv_ref),
                               atol=2e-6)


def test_g2p_columns_matches_gather():
    cfg, state, model, stress, vforce, dt = _setup()
    gv_in, gm = stepping.p2g(cfg, state, model, stress, vforce, dt)
    grid_v_out = stepping.grid_update(cfg, model, gv_in, gm, dt)

    # reference gather quantities
    base, fx, w, dw = stepping.bspline(state.x, cfg.inv_dx)
    w27 = stepping._stencil_products(w)
    dweight = stepping._dweight27(w, dw, cfg.inv_dx)
    gidx = jnp.clip(stepping._flat_indices(base, cfg.n_grid), 0,
                    cfg.n_grid ** 3 - 1)
    gv = grid_v_out[gidx]
    ref_v = jnp.sum(w27[..., None] * gv, axis=1)
    dpos = stepping._OFFSETS[None] - fx[:, None, :]
    ref_c = jnp.sum((w27 * cfg.inv_dx * 4.0)[..., None, None]
                    * gv[..., :, None] * dpos[..., None, :], axis=1)
    ref_g = jnp.sum(gv[..., :, None] * dweight[..., None, :], axis=1)

    new_v, new_c, grad_v = ct.g2p_columns(cfg, state, grid_v_out, K=64)
    np.testing.assert_allclose(np.asarray(new_v), np.asarray(ref_v),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_c), np.asarray(ref_c),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(grad_v), np.asarray(ref_g),
                               atol=2e-4)


def test_bins_overflow_detection():
    cfg, state, model, stress, vforce, dt = _setup()
    # tiny K alone must NOT overflow: dense columns chunk across rows
    bins = ct.build_bins(state.x, cfg, 2)
    assert int(bins.overflow) == 0
    # exceeding the total ROW cap must be reported
    bins = ct.build_bins(state.x, cfg, 2, c_cap=4)
    assert int(bins.overflow) > 0


def test_full_substep_column_path_matches():
    """p2g2p with column_k equals the scatter path, incl. mesh collider,
    mover and gather-based vertex forces."""
    from mpmavatar_tpu.sim import MPMSolver
    from test_substep_golden import make_cloth, build_pair
    import jax.numpy as jnp

    verts, faces = make_cloth(nx=6, ny=6, y0=1.0, extent=0.5)
    _, cfg, state, model = build_pair(verts, faces, E=200.0)
    cfg = dataclasses.replace(cfg, num_joint_v=4, num_joint_f=2)

    mesh_x = jnp.asarray([[0.6, 0.95, 0.6], [1.4, 0.95, 0.6],
                          [1.4, 0.95, 1.4], [0.6, 0.95, 1.4]], jnp.float32)
    mesh_f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    mesh_v = jnp.zeros_like(mesh_x)
    jv = jnp.full((4, 3), 0.02, jnp.float32)
    jf = jnp.full((2, 3), 0.02, jnp.float32)

    def run(col_k, mesh_k):
        s = MPMSolver(cfg, column_k=col_k, mesh_column_k=mesh_k,
                      faces=faces if col_k else None)
        s.add_surface_collider([0.0, 0.4, 0.0], [0.0, 1.0, 0.0])
        s.add_mesh_collider(mesh_f, friction=0.5)
        s.add_particle_mover()
        st = state
        for k in range(6):
            st = s.substep(st, model, 1e-4, k * 1e-4, mesh_x=mesh_x,
                           mesh_v=mesh_v, joint_verts_v=jv,
                           joint_faces_v=jf)
        return st

    ref = run(0, 0)
    fast = run(64, 16)
    np.testing.assert_allclose(np.asarray(fast.x), np.asarray(ref.x),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(fast.v), np.asarray(ref.v),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(fast.d), np.asarray(ref.d),
                               atol=1e-5)


def test_column_path_matches_numpy_oracle_trajectory():
    """Column-path trajectory vs the scalar numpy oracle over 20 substeps
    (BASELINE parity target: <1e-4 per-step drift)."""
    from reference_numpy import RefCloth
    from mpmavatar_tpu.sim import MPMSolver
    import jax.numpy as jnp

    verts, faces = make_cloth(nx=5, ny=5)
    ref, cfg, state, model = build_pair(verts, faces)
    solver = MPMSolver(cfg, column_k=64, faces=faces)
    for s in range(20):
        ref.substep(1e-4)
        state = solver.substep(state, model, 1e-4, s * 1e-4)
    np.testing.assert_allclose(np.asarray(state.x[cfg.n_elements:]),
                               ref.x[ref.E:], atol=5e-5)


def test_column_path_mixed_sand_cloth():
    """Column path == scatter path with a traditional (sand) block."""
    from mpmavatar_tpu.train.demo import build_demo_sim, get_sand
    from mpmavatar_tpu.sim import MPMSolver, SimTransform
    import jax.numpy as jnp

    verts, faces = make_cloth(nx=4, ny=4, y0=1.2, extent=0.4)
    sand, sand_vol = get_sand(center=(0.9, 1.5, 0.9),
                              length=(0.2, 0.04, 0.1), res=(6, 2, 3))
    body = np.array([[0.7, 0.9, 0.7], [1.3, 0.9, 0.7], [1.3, 0.9, 1.3],
                     [0.7, 0.9, 1.3]], np.float32)
    body_f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    tf = SimTransform.from_verts(verts)
    cfg, state, model, _ = build_demo_sim(
        verts, faces, sand, sand_vol, body, body_f, tf, grid_size=32)

    def run(col_k):
        s = MPMSolver(cfg, column_k=col_k, mesh_column_k=col_k and 16,
                      faces=faces if col_k else None)
        s.add_surface_collider([0.0, 0.1, 0.0], [0.0, 1.0, 0.0])
        s.add_mesh_collider(body_f, friction=0.5)
        st = state
        mx = tf.wld2sim(jnp.asarray(body))
        mv = jnp.zeros((4, 3))
        for k in range(6):
            st = s.substep(st, model, 1e-4, k * 1e-4, mesh_x=mx, mesh_v=mv)
        return st

    ref = run(0)
    fast = run(64)
    np.testing.assert_allclose(np.asarray(fast.x), np.asarray(ref.x),
                               atol=5e-6)
    np.testing.assert_allclose(np.asarray(fast.F_trial),
                               np.asarray(ref.F_trial), atol=1e-5)


def test_radius2_with_stale_bins_matches_exact():
    """Amortized rebinning: bins built from OLD positions + radius=2
    window must reproduce the exact transfer on drifted positions
    (drift < 1 cell)."""
    cfg, state, model, stress, vforce, dt = _setup()
    rng = np.random.default_rng(7)
    # drift up to ~0.8 cells in x/y/z
    drift = (rng.uniform(-0.8, 0.8, np.asarray(state.x).shape)
             * cfg.dx).astype(np.float32)
    moved = dataclasses.replace(state, x=state.x + jnp.asarray(drift))

    sel = (state.selection == 0).astype(jnp.float32)
    sstress = dt * sel[:cfg.n_no_vertices, None, None] * stress
    svf = dt * vforce

    # exact: fresh bins on moved positions
    gv_ref, gm_ref = ct.p2g_columns(cfg, moved, sstress, svf, K=64)
    # amortized: stale bins from the un-moved positions, radius 2
    stale_bins = ct.build_bins(state.x, cfg, 64)
    gv, gm = ct.p2g_columns(cfg, moved, sstress, svf, K=64,
                            bins=stale_bins, radius=2)
    np.testing.assert_allclose(np.asarray(gm), np.asarray(gm_ref),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gv_ref),
                               atol=2e-6)

    # g2p too
    grid = jnp.asarray(rng.normal(size=(cfg.n_grid ** 3, 3))
                       .astype(np.float32))
    ref = ct.g2p_columns(cfg, moved, grid, K=64)
    out = ct.g2p_columns(cfg, moved, grid, K=64, bins=stale_bins, radius=2)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_amortized_frame_close_to_exact():
    """solver.frame with rebin_every=4 + radius=2 stays close to the
    per-substep-rebin trajectory (exact while drift < 1 cell)."""
    from mpmavatar_tpu.sim import MPMSolver
    verts, faces = make_cloth(nx=6, ny=6, y0=1.1, extent=0.5)
    _, cfg, state, model = build_pair(verts, faces, E=200.0)

    def run(rebin_every, radius):
        s = MPMSolver(cfg, column_k=64, faces=faces,
                      column_radius=radius, rebin_every=rebin_every)
        st, _ = s.frame(state, model, 2e-4, 12, 0.0)
        return st

    exact = run(1, 1)
    amort = run(4, 2)
    np.testing.assert_allclose(np.asarray(amort.x), np.asarray(exact.x),
                               atol=1e-6)


def test_splat_columns_generic_channels():
    """splat_columns / rasterize_to_grid handle arbitrary channel counts
    (mover rasterization uses 3; cov export uses 6)."""
    from mpmavatar_tpu.core import stepping, types as T
    rng = np.random.default_rng(0)
    pts = jnp.asarray((0.4 + 1.2 * rng.random((300, 3))).astype(np.float32))
    cfg = T.MPMStaticConfig(n_elements=0, n_traditional=300, n_vertices=0,
                            n_grid=32, grid_lim=2.0)
    for c in (1, 3, 6):
        vals = jnp.asarray(rng.normal(size=(300, c)).astype(np.float32))
        gv_ref, gw_ref = stepping.rasterize_to_grid(cfg, pts, vals, 32 ** 3)
        gv, gw, _of = ct.splat_columns(cfg, pts, vals, K=32)
        np.testing.assert_allclose(np.asarray(gv), np.asarray(gv_ref),
                                   atol=5e-6)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                                   atol=5e-6)


@pytest.mark.slow
def test_bf16_transfer_mode():
    """column_bf16: half-precision einsum operands with f32 accumulation.
    Must stay within bf16 rounding of the f32 path and actually engage."""
    import dataclasses
    from mpmavatar_tpu.sim import MPMSolver
    verts, faces = make_cloth(nx=8, ny=8, y0=1.1, extent=0.5)
    _, cfg, state, model = build_pair(verts, faces, E=200.0)
    state = dataclasses.replace(state, v=state.v + 0.3)
    stress = jnp.zeros((cfg.n_no_vertices, 3, 3))
    vf = jnp.zeros((cfg.n_vertices, 3))
    a, am = ct.p2g_columns(cfg, state, stress, vf, 64)
    b, bm = ct.p2g_columns(cfg, state, stress, vf, 64, bf16=True)
    scale = float(jnp.abs(a).max())
    rel = float(jnp.abs(a - b).max()) / scale
    assert rel < 2e-2                      # within bf16 rounding
    assert float(jnp.abs(a - b).max()) > 0.0   # flag engaged

    s = MPMSolver(cfg, column_k=64, faces=faces, column_bf16=True)
    st, _ = s.frame(state, model, 2e-4, 6, 0.0)
    assert np.isfinite(np.asarray(st.x)).all()


def test_chunked_rows_dense_columns():
    """A column holding many more than K particles spans multiple rows
    and stays EXACT: the flat horizontal cloth stacks whole mesh rows
    into single (x, y) columns (this silently dropped 97% of the round-1
    bench scene before chunked rows)."""
    from mpmavatar_tpu.sim import MPMSolver
    verts, faces = make_cloth(nx=17, ny=17, y0=1.1, extent=0.5)
    _, cfg, state, model = build_pair(verts, faces, E=200.0)

    # tiny K forces every occupied column to span many chunk rows
    bins = ct.build_bins(state.x, cfg, K=8, c_cap=512)
    assert int(bins.overflow) == 0
    dup = np.asarray(bins.active_col)
    dup = dup[dup < cfg.n_grid * cfg.n_grid]
    assert len(dup) > len(np.unique(dup))     # chunking engaged

    s_col = MPMSolver(cfg, column_k=8, column_c_cap=512, faces=faces)
    st_c, _, of = s_col.frame(state, model, 2e-4, 10, 0.0,
                              return_overflow=True)
    assert int(of) == 0
    s_ref = MPMSolver(cfg, column_k=0)
    st_r, _ = s_ref.frame(state, model, 2e-4, 10, 0.0)
    np.testing.assert_allclose(np.asarray(st_c.x), np.asarray(st_r.x),
                               atol=1e-5)


def test_count_rows_matches_build_bins():
    """The adaptive-cap probe must equal the real pack-table occupancy."""
    from test_substep_golden import make_cloth, build_pair
    for nx, K in ((9, 8), (14, 4), (6, 64)):
        verts, faces = make_cloth(nx=nx, ny=nx, y0=1.1, extent=0.5)
        _, cfg, state, model = build_pair(verts, faces, E=200.0)
        rows = int(ct.count_rows(state.x, cfg, K))
        bins = ct.build_bins(state.x, cfg, K, c_cap=4096)
        used = int((np.asarray(bins.active_col)
                    < cfg.n_grid * cfg.n_grid).sum())
        assert rows == used, (nx, K, rows, used)


def test_ztile_p2g_g2p_match_scatter_z_spread():
    """z-tiled bins (the radius-1 fast layout) vs the scatter path on a
    scene spanning many z tiles, including particles right at tile
    boundaries and near the z walls."""
    cfg, state, model, stress, vforce, dt = _setup()
    G = cfg.n_grid
    rng = np.random.default_rng(3)
    # respread particles through the full z range (tile span + walls)
    x = np.asarray(state.x).copy()
    x[:, 2] = rng.uniform(0.2 * cfg.dx, (G - 1.2) * cfg.dx, len(x))
    # pin some exactly at tile boundaries (base_z = t*_ZH)
    x[: ct._ZH * 2, 2] = ((np.arange(ct._ZH * 2) % (G // ct._ZH + 1))
                          * ct._ZH + 0.51) * cfg.dx
    state = dataclasses.replace(state, x=jnp.asarray(x))
    new_d, _, _, stress, vforce = stepping.compute_stress(
        cfg, state, model, dt)
    state = dataclasses.replace(state, d=new_d)

    gv_ref, gm_ref = stepping.p2g(cfg, state, model, stress, vforce, dt)
    sel = (state.selection == 0).astype(jnp.float32)
    sstress = dt * sel[:cfg.n_no_vertices, None, None] * stress
    gv, gm = ct.p2g_columns(cfg, state, sstress, dt * vforce, K=16,
                            ztile=True)
    bins = ct.build_bins(state.x, cfg, 16, ztile=True)
    assert int(bins.overflow) == 0
    np.testing.assert_allclose(np.asarray(gm), np.asarray(gm_ref),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gv_ref),
                               rtol=1e-4, atol=1e-7)

    grid_v = stepping.grid_update(cfg, model, gv_ref, gm_ref, dt)
    nv_ref, nc_ref, gr_ref = stepping.g2p_gather(cfg, state, grid_v, dt) \
        if hasattr(stepping, "g2p_gather") else (None, None, None)
    nv, nc, gr = ct.g2p_columns(cfg, state, grid_v, 16, ztile=True)
    nv2, nc2, gr2 = ct.g2p_columns(cfg, state, grid_v, 16, ztile=False)
    np.testing.assert_allclose(np.asarray(nv), np.asarray(nv2),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(nc), np.asarray(nc2),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(gr2),
                               rtol=1e-5, atol=1e-6)


def test_ztile_count_rows_matches_build_bins():
    cfg, state, model, stress, vforce, dt = _setup()
    rows = int(ct.count_rows(state.x, cfg, 16, True))
    bins = ct.build_bins(state.x, cfg, 16, c_cap=rows, ztile=True)
    assert int(bins.overflow) == 0
    bins_small = ct.build_bins(state.x, cfg, 16, c_cap=max(rows // 2, 1),
                               ztile=True)
    assert int(bins_small.overflow) > 0
