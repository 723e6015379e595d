"""Per-phase TPU profile of the MPM substep at bench scale.

Times each phase of the column-path substep in isolation (compile once,
steady-state loop, host-transfer sync) so kernel work targets the real
bottleneck.  Phases:

  bins      build_bins (argsort + compaction)
  geom      pack_geometry (z-bases, xy weights)
  stress    compute_stress (QR return map + anisotropic stress)
  p2g       p2g_columns (coefficient einsum + column scatters)
  grid      grid normalization + gravity + BCs
  meshcol   mesh-collider splat + projection
  g2p       g2p_columns (gather + APIC reconstruction)
  substep   the fused full substep for reference

Run on the TPU: ``python -u scripts/profile_substep.py``.
Writes nothing; prints one line per phase.
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
    from mpmavatar_tpu.ops import column_transfer as ct
    from mpmavatar_tpu.sim import MPMSolver

    nx = ny = 183
    verts, faces = build_cloth(nx, ny)
    cfg = types.MPMStaticConfig(n_elements=len(faces), n_traditional=0,
                                n_vertices=len(verts), n_grid=128,
                                grid_lim=2.0, material=7,
                                num_joint_v=min(256, len(verts)),
                                num_joint_f=min(128, len(faces)))
    d, r_inv, evol, vvol = types.cloth_geometry(jnp.asarray(verts),
                                                jnp.asarray(faces))
    x = jnp.concatenate([jnp.asarray(verts)[faces].mean(1),
                         jnp.asarray(verts)], 0)
    vol = jnp.concatenate([evol, vvol], 0)
    state = types.make_state(cfg, x, faces=faces, d=d, R_inv=r_inv, vol=vol)
    model = types.make_model(cfg.n_particles, E=2000.0, nu=0.3)

    body_v, body_f = build_body_sphere()
    K, MK, CAP = 48, 32, 4096
    solver = MPMSolver(cfg, column_k=K, mesh_column_k=MK, faces=faces,
                       column_c_cap=CAP)
    solver.add_surface_collider([0.0, 0.1, 0.0], [0.0, 1.0, 0.0])
    solver.add_mesh_collider(body_f, friction=0.5)
    solver.add_particle_mover()

    dt = 1e-4
    mesh_x = jnp.asarray(body_v)
    mesh_v = jnp.zeros_like(mesh_x)
    jv = jnp.zeros((cfg.num_joint_v, 3), jnp.float32)
    jf = jnp.zeros((cfg.num_joint_f, 3), jnp.float32)
    vf_inc = jnp.asarray(ct.build_vertex_incidence(faces, cfg.n_vertices))

    bins = ct.build_bins(state.x, cfg, K, c_cap=CAP)
    geom = ct.pack_geometry(cfg, state.x, bins)
    st1 = solver.substep(state, model, dt, 0.0, mesh_x=mesh_x,
                         mesh_v=mesh_v, joint_verts_v=jv, joint_faces_v=jf)
    _, _, _, stress, vforce = stepping.compute_stress(
        cfg, state, model, dt, vf_incidence=vf_inc)
    sel = (state.selection == 0).astype(state.x.dtype)
    nnv = cfg.n_no_vertices
    gv, gm = ct.p2g_columns(cfg, state, dt * sel[:nnv, None, None] * stress,
                            dt * vforce, K, bins=bins, geom=geom)

    def timeit(name, fn, *args, reps=20):
        f = jax.jit(fn)
        out = f(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf))                        # compile + sync
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf))
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name:10s} {ms:8.2f} ms")
        return ms

    timeit("bins", lambda xx: ct.build_bins(xx, cfg, K, c_cap=CAP), state.x)
    timeit("geom", lambda xx: ct.pack_geometry(cfg, xx, bins), state.x)
    timeit("stress",
           lambda st: stepping.compute_stress(cfg, st, model, dt,
                                              vf_incidence=vf_inc)[3], state)
    def _p2g(st_, b_, g_, s_, v_, **kw):
        return ct.p2g_columns(cfg, st_, dt * sel[:nnv, None, None] * s_,
                              dt * v_, K, bins=b_, geom=g_, **kw)

    timeit("p2g_scat", _p2g, state, bins, geom, stress, vforce)
    timeit("p2g_bf16",
           lambda st_, b_, g_, s_, v_: _p2g(st_, b_, g_, s_, v_,
                                            bf16=True),
           state, bins, geom, stress, vforce)
    timeit("g2p",
           lambda st_, b_, gm_, g_: ct.g2p_columns(cfg, st_, g_, K,
                                                   bins=b_, geom=gm_),
           state, bins, geom, gv)
    # raw einsum layout A/B: is the small minor output dim starving
    # the MXU?  (m=K*3=144, z=G=128, n=4S / S*3)
    import numpy as _np
    rngp = _np.random.default_rng(0)
    zmat = jnp.asarray(rngp.normal(size=(CAP, K * 3, 128)).astype(_np.float32))
    coef = jnp.asarray(rngp.normal(size=(CAP, K * 3, 36)).astype(_np.float32))
    gall = jnp.asarray(rngp.normal(size=(CAP, 128, 27)).astype(_np.float32))
    timeit("e_p2g_zn", lambda a, b: jnp.einsum("cmz,cmn->czn", a, b),
           zmat, coef)
    timeit("e_p2g_nz", lambda a, b: jnp.einsum("cmz,cmn->cnz", a, b),
           zmat, coef)
    timeit("e_g2p_mn", lambda a, b: jnp.einsum("cmz,czn->cmn", a, b),
           zmat, gall)
    timeit("e_g2p_nm", lambda a, b: jnp.einsum("cmz,czn->cnm", a, b),
           zmat, gall)
    timeit("substep",
           lambda st: solver.substep(st, model, dt, 0.0, mesh_x=mesh_x,
                                     mesh_v=mesh_v, joint_verts_v=jv,
                                     joint_faces_v=jf), state, reps=10)
    _ = st1


if __name__ == "__main__":
    main()
