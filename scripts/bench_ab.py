"""A/B bench of MPM solver configs on the standard 100k/128^3 scene.

Runs each named config for a few frames and prints substeps/s — the
decision tool for bench.py's default knobs (always A/B on the chip:
XLA/Mosaic perf on this TPU is not predictable from first principles).
"""

import json
import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    from mpmavatar_tpu.utils import compile_cache
    compile_cache.setup()
    import jax.numpy as jnp

    from bench import build_cloth, build_body_sphere
    from mpmavatar_tpu.core import types
    from mpmavatar_tpu.sim import MPMSolver

    # fail fast if Mosaic rejects the fused kernels at this scale
    from mpmavatar_tpu.ops import column_transfer as ct
    from mpmavatar_tpu.ops import pallas_transfer as pt

    nx = ny = 183
    verts, faces = build_cloth(nx, ny)
    cfg = types.MPMStaticConfig(n_elements=len(faces), n_traditional=0,
                                n_vertices=len(verts), n_grid=128,
                                grid_lim=2.0, material=7,
                                num_joint_v=256, num_joint_f=128)
    d, r_inv, evol, vvol = types.cloth_geometry(jnp.asarray(verts),
                                                jnp.asarray(faces))
    x = jnp.concatenate([jnp.asarray(verts)[faces].mean(1),
                         jnp.asarray(verts)], 0)
    vol = jnp.concatenate([evol, vvol], 0)
    state0 = types.make_state(cfg, x, faces=faces, d=d, R_inv=r_inv,
                              vol=vol)
    model = types.make_model(cfg.n_particles, E=2000.0, nu=0.3)
    body_v, body_f = build_body_sphere()
    mesh_x = jnp.asarray(body_v)
    mesh_v = jnp.zeros_like(mesh_x)
    jv = jnp.zeros((cfg.num_joint_v, 3), jnp.float32)
    jf = jnp.zeros((cfg.num_joint_f, 3), jnp.float32)

    # pallas smoke (tiny): surfaces Mosaic compile errors immediately
    bins = ct.build_bins(state0.x, cfg, 48, c_cap=6144)
    try:
        gv, gm = pt.p2g_columns_fused(
            cfg, state0, jnp.zeros((cfg.n_no_vertices, 3, 3)),
            jnp.zeros((cfg.n_vertices, 3)), 48, bins=bins, radius=1)
        float(jnp.sum(gm))
        print("pallas p2g smoke ok", flush=True)
        out = pt.g2p_columns_fused(cfg, state0,
                                   jnp.zeros((cfg.n_grid ** 3, 3)), 48,
                                   bins=bins, radius=1)
        float(jnp.sum(out[0]))
        print("pallas g2p smoke ok", flush=True)
    except Exception as e:
        print("PALLAS SMOKE FAILED:", repr(e)[:2000], flush=True)

    configs = {
        "xla_r1_exact": dict(column_radius=1),
        "xla_r2_auto": dict(column_radius=2, rebin_auto=True),
        "pal_r1_exact": dict(column_radius=1, column_pallas=True),
        "pal_r2_auto": dict(column_radius=2, rebin_auto=True,
                            column_pallas=True),
        "pal_r1_bf16": dict(column_radius=1, column_pallas=True,
                            column_bf16=True),
        "pal_r2_auto_bf16": dict(column_radius=2, rebin_auto=True,
                                 column_pallas=True, column_bf16=True),
    }

    dt = 1e-4
    substeps = 100
    for name, kw in configs.items():
        try:
            solver = MPMSolver(cfg, column_k=48, mesh_column_k=32,
                               faces=faces, column_c_cap=6144, **kw)
            solver.add_surface_collider([0.0, 0.1, 0.0], [0.0, 1.0, 0.0])
            solver.add_mesh_collider(body_f, friction=0.5)
            solver.add_particle_mover()

            def run_frame(st):
                st, _, of = solver.frame(st, model, dt, substeps, 0.0,
                                         mesh_x=mesh_x, mesh_v=mesh_v,
                                         joint_verts_v=jv,
                                         joint_faces_v=jf,
                                         return_overflow=True)
                return st, of

            run = jax.jit(run_frame)
            st, of = run(state0)
            float(jnp.sum(st.x))            # compile + warmup + sync
            assert int(of) == 0, f"overflow {int(of)}"
            st, _ = run(st)
            float(jnp.sum(st.x))
            n_frames = 3
            t0 = time.perf_counter()
            for _ in range(n_frames):
                st, _ = run(st)
            float(jnp.sum(st.x))
            dt_wall = time.perf_counter() - t0
            sps = n_frames * substeps / dt_wall
            import numpy as np
            ok = bool(np.isfinite(np.asarray(st.x)).all())
            print(json.dumps({"config": name, "substeps_per_s":
                              round(sps, 2), "finite": ok}), flush=True)
        except Exception as e:
            print(json.dumps({"config": name,
                              "error": repr(e)[:800]}), flush=True)


if __name__ == "__main__":
    main()
