"""Per-phase TPU profile of the demo-shaped scene (250^3 + sand).

Builds the exact bench.py mixed scene (100k-particle cloth + N sand
traditional particles on a G^3 grid) and times each substep phase in
isolation, plus the full fused substep.  Run:

    python -u scripts/profile_demo.py --grid 250 --sand 100000
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--grid", type=int, default=250)
    parser.add_argument("--sand", type=int, default=100000)
    parser.add_argument("--row_cap", type=int, default=None)
    parser.add_argument("--column_k", type=int, default=96)
    parser.add_argument("--reps", type=int, default=30)
    args = parser.parse_args()

    import jax
    from mpmavatar_tpu.utils import compile_cache
    compile_cache.setup()
    import jax.numpy as jnp
    import numpy as np

    from bench import build_cloth, build_body_sphere
    from mpmavatar_tpu.core import types, stepping
    from mpmavatar_tpu.ops import column_transfer as ct
    from mpmavatar_tpu.ops import pallas_transfer as pt
    from mpmavatar_tpu.ops import pallas_grid_pipeline as pgp
    from mpmavatar_tpu.sim import MPMSolver

    G = args.grid
    K = args.column_k
    verts, faces = build_cloth(183, 183)
    n_t = args.sand
    cfg = types.MPMStaticConfig(n_elements=len(faces), n_traditional=n_t,
                                n_vertices=len(verts), n_grid=G,
                                grid_lim=2.0, material=(2 if n_t else 7),
                                num_joint_v=256, num_joint_f=128)
    d, r_inv, evol, vvol = types.cloth_geometry(jnp.asarray(verts),
                                                jnp.asarray(faces))
    parts = [jnp.asarray(verts)[faces].mean(1)]
    vols = [evol]
    if n_t:
        rngs = np.random.default_rng(0)
        sand = (rngs.random((n_t, 3)).astype(np.float32)
                * np.asarray([0.8, 0.1, 0.4]) + np.asarray([0.6, 1.6, 0.8]))
        parts.append(jnp.asarray(sand))
        vols.append(jnp.full((n_t,), 1e-7, jnp.float32))
    parts.append(jnp.asarray(verts))
    vols.append(vvol)
    x = jnp.concatenate(parts, 0)
    vol = jnp.concatenate(vols, 0)
    state = types.make_state(cfg, x, faces=faces, d=d, R_inv=r_inv, vol=vol)
    model = types.make_model(cfg.n_particles, E=2000.0, nu=0.3)
    body_v, body_f = build_body_sphere()
    mesh_x = jnp.asarray(body_v)
    mesh_v = jnp.zeros_like(mesh_x)
    jv = jnp.zeros((cfg.num_joint_v, 3), jnp.float32)
    jf = jnp.zeros((cfg.num_joint_f, 3), jnp.float32)

    solver = MPMSolver(cfg, column_k=K, mesh_column_k=32, faces=faces,
                       column_c_cap=args.row_cap or 6144,
                       column_radius=1, rebin_auto=False,
                       column_pallas=True, fused_grid=True,
                       fused_stress=True, halo_cap=4096,
                       z_window="auto")
    solver.add_surface_collider([0.0, 0.1, 0.0], [0.0, 1.0, 0.0])
    solver.add_mesh_collider(body_f, friction=0.5)
    solver.add_particle_mover()
    solver.adapt_mesh_cap(mesh_x)
    if args.row_cap is None:
        solver.adapt_row_cap(state)
    print(f"caps: row={solver.column_c_cap} halo={solver.halo_cap} "
          f"zwin={solver.z_window} mesh={solver.mesh_c_cap}")
    c_cap = solver.column_c_cap
    halo_cap = solver.halo_cap
    z_window = solver.z_window

    dt = 1e-4
    vf_inc = solver.vf_incidence
    sel = (state.selection == 0).astype(jnp.float32)
    nnv = cfg.n_no_vertices
    colliders = solver.colliders

    def timeit(name, fn, *a, reps=args.reps):
        f = jax.jit(fn)
        out = f(*a)
        # honest fence: device->host readback (block_until_ready can
        # return early on this runtime — bench.py discipline)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(*a)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name:36s} {ms:8.3f} ms")
        return out

    # --- phases -----------------------------------------------------
    bins = timeit("build_bins", lambda xx: ct.build_bins(
        xx, cfg, K, c_cap=c_cap), state.x)
    halo = timeit("build_halo", lambda b: ct.build_halo(
        b, cfg, 1, halo_cap), bins)

    stress_out = timeit(
        "compute_stress (fused)",
        lambda st: stepping.compute_stress(cfg, st, model, dt,
                                           vf_incidence=vf_inc,
                                           pallas=True),
        state)
    _, _, _, stress, vertex_force = stress_out

    # z-window pick (device math replicated from p2g2p)
    zb = jnp.clip(jnp.floor(state.x[:, 2] * cfg.inv_dx - 0.5)
                  .astype(jnp.int32), 0, G - 1)
    zw = z_window if isinstance(z_window, int) else None
    if zw is None and z_window is not None:
        # replicate the auto pick
        zmin = int(jnp.min(zb)) ; zmax = int(jnp.max(zb))
        zw = solver._pick_z_window(zmin, zmax)
    if zw is None:
        z_lo = jnp.zeros((), jnp.int32)
        z_win = None
        zw_eff = G
    else:
        z_lo = jnp.clip(jnp.min(zb) - 1, 0, G - zw)
        z_win = (z_lo.astype(jnp.float32) * cfg.dx, zw)
        zw_eff = zw
    print(f"z_window = {zw}")

    def _p2g(st, b, h):
        rd = model.rpic_damping
        c = st.C
        c_eff = (1.0 - rd) * c + rd / 2.0 * (c - jnp.swapaxes(c, -1, -2))
        c_eff = jnp.where(rd < -0.001, 0.0, c_eff)
        return pt.p2g_columns_fused(
            cfg, st, dt * sel[:nnv, None, None] * stress,
            dt * vertex_force, K, bins=b, c_eff=c_eff, radius=1,
            return_px=True, halo=h, z_win=z_win)

    p2g_out = timeit("p2g_columns_fused", _p2g, state, bins, halo)
    grid_v_in, grid_m, px_t = p2g_out

    mesh_out = timeit(
        "mesh_collider_fields",
        lambda h: stepping.mesh_collider_fields(
            cfg, colliders.mesh_colliders[0], mesh_x, mesh_v,
            column_k=32, c_cap=solver.mesh_c_cap, use_pallas=True,
            halo=h, z_win=z_win), halo)
    acc, gw, _ = mesh_out

    mover_out = timeit(
        "mover_fields",
        lambda st, h: stepping.mover_fields(cfg, st, jv, jf, None,
                                            halo=h, use_pallas=True,
                                            z_win=z_win), state, halo)
    mv_, mw_ = mover_out

    n_cells = halo.hcols.shape[0] * zw_eff
    pipeline = pgp.make_grid_pipeline(cfg, colliders.grid_post,
                                      has_mesh=True, has_mover=True,
                                      n_cells=n_cells)
    sp = pgp.pack_surface_params(colliders.grid_post)

    def _pipe(gvi, gm, a, g, mv, mw, h):
        return pipeline(gvi, gm, a, g, mv, mw, model.gravity,
                        model.grid_v_damping_scale,
                        colliders.mesh_colliders[0].friction,
                        jnp.float32(0.0), dt, sp,
                        cell_ids=ct.halo_cell_ids(h, G, z_lo, zw_eff))

    grid_v_out = timeit("grid_pipeline", _pipe, grid_v_in, grid_m,
                        acc, gw, mv_, mw_, halo)

    g2p_gather = timeit(
        "g2p_columns_fused",
        lambda st, gvo, b, h: pt.g2p_columns_fused(
            cfg, st, gvo, K, bins=b, radius=1, px_t=px_t, halo=h,
            z_win=z_win),
        state, grid_v_out, bins, halo)

    timeit("g2p tail (advect+F+d)",
           lambda st, g: stepping.g2p(cfg, st, model, grid_v_out, dt,
                                      gathered=g),
           state, g2p_gather)

    # --- full substep ------------------------------------------------
    def substep(st):
        return stepping.p2g2p(cfg, colliders, st, model,
                              jnp.float32(dt), jnp.float32(0.0),
                              mesh_x=mesh_x, mesh_v=mesh_v,
                              joint_verts_v=jv, joint_faces_v=jf,
                              column_k=K, mesh_column_k=32,
                              mesh_c_cap=solver.mesh_c_cap,
                              column_c_cap=c_cap, column_radius=1,
                              column_pallas=True, fused_grid=True,
                              fused_stress=True, halo_cap=halo_cap,
                              z_window=(zw if zw else None), vf_incidence=vf_inc)
    timeit("FULL substep", substep, state, reps=args.reps)


if __name__ == "__main__":
    main()
