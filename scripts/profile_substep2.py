"""Fine-grained TPU profile: every substep phase + pallas-vs-XLA kernels.

Complements profile_substep.py with the phases it left untimed
(mesh-collider splat, particle mover, grid BCs) and standalone timings
of the fused Pallas kernels against their XLA counterparts, plus K/cap
layout A/Bs.  Run: python -u scripts/profile_substep2.py
"""

import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    from mpmavatar_tpu.utils import compile_cache
    compile_cache.setup()
    import jax.numpy as jnp

    from bench import build_cloth, build_body_sphere
    from mpmavatar_tpu.core import types, stepping
    from mpmavatar_tpu.core.colliders import ColliderSet, SurfaceCollider
    from mpmavatar_tpu.ops import column_transfer as ct
    from mpmavatar_tpu.ops import pallas_transfer as pt

    verts, faces = build_cloth(183, 183)
    cfg = types.MPMStaticConfig(n_elements=len(faces), n_traditional=0,
                                n_vertices=len(verts), n_grid=128,
                                grid_lim=2.0, material=7,
                                num_joint_v=256, num_joint_f=128)
    d, r_inv, evol, vvol = types.cloth_geometry(jnp.asarray(verts),
                                                jnp.asarray(faces))
    x = jnp.concatenate([jnp.asarray(verts)[faces].mean(1),
                         jnp.asarray(verts)], 0)
    state = types.make_state(cfg, x, faces=faces, d=d, R_inv=r_inv,
                             vol=jnp.concatenate([evol, vvol]))
    model = types.make_model(cfg.n_particles, E=2000.0, nu=0.3)
    body_v, body_f = build_body_sphere()
    mesh_x = jnp.asarray(body_v)
    mesh_v = jnp.zeros_like(mesh_x)
    jv = jnp.zeros((256, 3), jnp.float32)
    jf = jnp.zeros((128, 3), jnp.float32)
    vf_inc = jnp.asarray(ct.build_vertex_incidence(faces, cfg.n_vertices))
    dt = 1e-4
    sel = (state.selection == 0).astype(jnp.float32)
    nnv = cfg.n_no_vertices

    def timeit(name, fn, *args, reps=20):
        f = jax.jit(fn)
        try:
            out = f(*args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(jnp.sum(leaf))
            t0 = time.perf_counter()
            for _ in range(reps):
                out = f(*args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(jnp.sum(leaf))
            ms = (time.perf_counter() - t0) / reps * 1e3
            print(f"{name:18s} {ms:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:18s} FAIL {str(e).splitlines()[0][:90]}",
                  flush=True)

    # phases at the default K=48 / cap=6144 layout, radius 1
    K, CAP = 48, 6144
    bins = ct.build_bins(state.x, cfg, K, c_cap=CAP)
    geom = ct.pack_geometry(cfg, state.x, bins)
    _, _, _, stress, vforce = stepping.compute_stress(
        cfg, state, model, dt, vf_incidence=vf_inc)
    sstress = dt * sel[:nnv, None, None] * stress
    svf = dt * vforce
    gv, gm = ct.p2g_columns(cfg, state, sstress, svf, K, bins=bins,
                            geom=geom)
    grid_v = stepping.grid_update(cfg, model, gv, gm, dt)

    timeit("bins", lambda xx: ct.build_bins(xx, cfg, K, c_cap=CAP),
           state.x)
    timeit("stress", lambda st: stepping.compute_stress(
        cfg, st, model, dt, vf_incidence=vf_inc)[3], state)
    timeit("xla_p2g+geom", lambda st, b, s, v: ct.p2g_columns(
        cfg, st, s, v, K, bins=b,
        geom=ct.pack_geometry(cfg, st.x, b)), state, bins, sstress, svf)
    timeit("xla_g2p+geom", lambda st, b, g: ct.g2p_columns(
        cfg, st, g, K, bins=b,
        geom=ct.pack_geometry(cfg, st.x, b)), state, bins, grid_v)
    timeit("pal_p2g", lambda st, b, s, v: pt.p2g_columns_fused(
        cfg, st, s, v, K, bins=b, interpret=False),
        state, bins, sstress, svf)
    timeit("pal_g2p", lambda st, b, g: pt.g2p_columns_fused(
        cfg, st, g, K, bins=b, interpret=False), state, bins, grid_v)
    # grid-side phases
    timeit("grid_update", lambda a, b: stepping.grid_update(
        cfg, model, a, b, dt), gv, gm)
    from mpmavatar_tpu.core.colliders import MeshCollider
    mc = MeshCollider(faces=jnp.asarray(body_f, jnp.int32),
                      friction=jnp.float32(0.5))
    timeit("meshcol", lambda g, mx, mv: stepping.apply_mesh_collider(
        cfg, mc, mx, mv, g, column_k=32)[0], grid_v, mesh_x, mesh_v)
    timeit("mover", lambda g, a, b: stepping.apply_particle_mover(
        cfg, state, g, a, b), grid_v, jv, jf)
    floor = SurfaceCollider(point=jnp.asarray([0.0, 0.1, 0.0]),
                            normal=jnp.asarray([0.0, 1.0, 0.0]),
                            friction=jnp.float32(0.0),
                            start_time=jnp.float32(0.0),
                            end_time=jnp.float32(999.0))
    timeit("grid_bc", lambda g: stepping.apply_grid_bc(
        cfg, floor, g, jnp.float32(0.0), dt), grid_v)
    timeit("g2p_wrapper", lambda st, g: stepping.g2p(
        cfg, st, model, g, dt,
        gathered=ct.g2p_columns(cfg, st, g, K, bins=bins, geom=geom)),
        state, grid_v)

    # layout A/B: K=32 cap 8192
    bins32 = ct.build_bins(state.x, cfg, 32, c_cap=8192)
    timeit("xla_p2g_K32", lambda st, b, s, v: ct.p2g_columns(
        cfg, st, s, v, 32, bins=b,
        geom=ct.pack_geometry(cfg, st.x, b)), state, bins32, sstress, svf)
    timeit("xla_g2p_K32", lambda st, b, g: ct.g2p_columns(
        cfg, st, g, 32, bins=b,
        geom=ct.pack_geometry(cfg, st.x, b)), state, bins32, grid_v)
    # bf16 on the XLA path
    timeit("xla_p2g_bf16", lambda st, b, s, v: ct.p2g_columns(
        cfg, st, s, v, K, bins=b, bf16=True,
        geom=ct.pack_geometry(cfg, st.x, b, zb_dtype=jnp.bfloat16)),
        state, bins, sstress, svf)


if __name__ == "__main__":
    main()
