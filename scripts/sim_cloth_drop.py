#!/usr/bin/env python
"""Cloth-drop sanity simulation (BASELINE.json config 1): ~10k particles,
64^3 grid, static body collider, no rendering.  Writes OBJ frames."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import numpy as np
    import jax.numpy as jnp
    from mpmavatar_tpu.core import types
    from mpmavatar_tpu.sim import MPMSolver
    from mpmavatar_tpu.utils.io import read_obj, write_obj
    from bench import build_cloth, build_body_sphere

    parser = argparse.ArgumentParser()
    parser.add_argument("--out_dir", default="./output/cloth_drop")
    parser.add_argument("--grid", type=int, default=64)
    parser.add_argument("--nx", type=int, default=58)  # ~10k particles
    parser.add_argument("--frames", type=int, default=25)
    parser.add_argument("--substeps", type=int, default=400)
    parser.add_argument("--body_obj", default=None)
    parser.add_argument("--column_k", type=int, default=96)
    parser.add_argument("--pallas", action="store_true", default=None,
                        help="fused-Pallas transfer kernels (default: "
                        "auto — on for real TPUs)")
    parser.add_argument("--no_pallas", dest="pallas",
                        action="store_false",
                        help="force the XLA column path")
    parser.add_argument("--mesh_column_k", type=int, default=64,
                        help="collider-splat slots per column; must cover "
                        "the max collider faces per (x,y) cell — the frame "
                        "loop raises on overflow")
    parser.add_argument("--halo_cap", type=int, default=0,
                        help="packed halo (sparse) grid column cap; 0 = "
                        "dense grid")
    args = parser.parse_args()

    verts, faces = build_cloth(args.nx, args.nx, y0=1.3, extent=0.8)
    cfg = types.MPMStaticConfig(
        n_elements=len(faces), n_traditional=0, n_vertices=len(verts),
        n_grid=args.grid, grid_lim=2.0, material=7)
    d, r_inv, evol, vvol = types.cloth_geometry(jnp.asarray(verts),
                                                jnp.asarray(faces))
    x = jnp.concatenate([jnp.asarray(verts)[faces].mean(1),
                         jnp.asarray(verts)], 0)
    state = types.make_state(cfg, x, faces=faces, d=d, R_inv=r_inv,
                             vol=jnp.concatenate([evol, vvol]))
    model = types.make_model(cfg.n_particles, E=2000.0)

    if args.body_obj:
        body_v, body_f = read_obj(args.body_obj)
    else:
        body_v, body_f = build_body_sphere(center=(1.0, 0.8, 1.0), r=0.3)
    solver = MPMSolver(cfg, column_k=args.column_k,
                       mesh_column_k=args.mesh_column_k, faces=faces,
                       column_pallas=args.pallas,
                       halo_cap=(args.halo_cap or None))
    solver.add_surface_collider([0.0, 0.1, 0.0], [0.0, 1.0, 0.0])
    solver.add_mesh_collider(body_f, friction=0.5)

    os.makedirs(args.out_dir, exist_ok=True)
    dt = (1.0 / 25.0) / args.substeps
    mesh_x = jnp.asarray(body_v)
    mesh_v = jnp.zeros_like(mesh_x)
    t = 0.0
    for f in range(args.frames):
        state, t, of = solver.frame(state, model, dt, args.substeps, t,
                                    mesh_x=mesh_x, mesh_v=mesh_v,
                                    return_overflow=True)
        solver.check_overflow(of, context=f"frame {f}")
        cloth = np.asarray(state.x)[cfg.n_elements:]
        write_obj(os.path.join(args.out_dir, f"{f:03d}.obj"), cloth, faces)
        print(f"frame {f}: y range [{cloth[:, 1].min():.3f}, "
              f"{cloth[:, 1].max():.3f}]", flush=True)
    assert np.isfinite(np.asarray(state.x)).all()
    print("cloth drop complete")


if __name__ == "__main__":
    main()
