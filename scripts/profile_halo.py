"""On-chip A/B of the packed halo grid vs the dense grid at bench shape.

Times build_halo in isolation and the full jitted frame (100 substeps)
with halo on/off at a given grid size.  Run on the TPU:
    python -u scripts/profile_halo.py [--grid 128] [--substeps 20]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--grid", type=int, default=128)
    parser.add_argument("--substeps", type=int, default=20)
    parser.add_argument("--row_cap", type=int, default=4096)
    parser.add_argument("--halo_cap", type=int, default=4096)
    args = parser.parse_args()

    import jax
    from mpmavatar_tpu.utils import compile_cache
    compile_cache.setup()
    import jax.numpy as jnp

    from bench import build_cloth, build_body_sphere
    from mpmavatar_tpu.core import types
    from mpmavatar_tpu.ops import column_transfer as ct
    from mpmavatar_tpu.sim import MPMSolver

    verts, faces = build_cloth(183, 183)
    G = args.grid
    cfg = types.MPMStaticConfig(n_elements=len(faces), n_traditional=0,
                                n_vertices=len(verts), n_grid=G,
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

    def timeit(name, f, *a, reps=20):
        out = f(*a)
        jax.tree.map(lambda t: t.block_until_ready(), out)
        float(jnp.sum(jax.tree.leaves(out)[0]))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(*a)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        dt_ms = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name:32s} {dt_ms:8.3f} ms")
        return out

    # --- build_halo in isolation --------------------------------------
    bins = ct.build_bins(x, cfg, 96, c_cap=args.row_cap)
    bj = jax.jit(lambda xx: ct.build_bins(xx, cfg, 96,
                                          c_cap=args.row_cap))
    timeit("build_bins", bj, x)
    hj = jax.jit(lambda b: ct.build_halo(b, cfg, 1, args.halo_cap))
    timeit("build_halo(bins)", hj, bins)
    bhj = jax.jit(lambda xx: ct.build_halo(
        ct.build_bins(xx, cfg, 96, c_cap=args.row_cap), cfg, 1,
        args.halo_cap))
    timeit("bins+halo fused", bhj, x)
    halo = hj(bins)
    print(f"n_halo = {int(halo.n_h)} / cap {args.halo_cap} "
          f"(G^2 = {G * G})")

    # --- full frame halo on/off ---------------------------------------
    for halo_cap in (None, args.halo_cap):
        solver = MPMSolver(cfg, column_k=96, mesh_column_k=32,
                           faces=faces, column_c_cap=args.row_cap,
                           halo_cap=halo_cap)
        solver.add_surface_collider([0.0, 0.1, 0.0], [0.0, 1.0, 0.0])
        solver.add_mesh_collider(body_f, friction=0.5)
        solver.add_particle_mover()
        solver.adapt_mesh_cap(mesh_x)

        def run(st):
            st, _, of = solver.frame(st, model, 1e-4, args.substeps,
                                     0.0, mesh_x=mesh_x, mesh_v=mesh_v,
                                     joint_verts_v=jv, joint_faces_v=jf,
                                     return_overflow=True)
            return st, of
        rj = jax.jit(run)
        st, of = rj(state)
        jax.block_until_ready(st.x)
        assert int(of) == 0
        float(jnp.sum(st.x))
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            st, of = rj(state)
            float(jnp.sum(st.x))
        dt_ms = (time.perf_counter() - t0) / reps / args.substeps * 1e3
        name = f"frame halo={halo_cap}"
        print(f"{name:32s} {dt_ms:8.3f} ms/substep "
              f"({1e3 / dt_ms:.1f} sps)")


if __name__ == "__main__":
    main()
