#!/usr/bin/env python
"""Run the SHARDED program on the real TPU (VERDICT r4 item 7).

All parallel/ evidence so far is the 8-device virtual CPU mesh; this
executes the same shard_map programs (collectives + Pallas kernels under
shard_map) on a 1-device Mesh on the actual chip and reports the
overhead vs the unsharded paths:

  1. make_sharded_frame, bench shape (~100k cloth, 128^3, mesh collider
     + pinning, column K=96 fast path) vs MPMSolver.frame on the same
     scene.
  2. one DP appearance train step (full stage-2 loss + psum'd densify
     stats) at production 1500x1000/50k vs the unsharded train step.

Prints one JSON line.  Run: python scripts/tpu_sharded_check.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def sync(tree):
    import jax
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(np.asarray(leaf).ravel()[0])


def sim_check(mesh, reps=3, substeps=50):
    import jax.numpy as jnp
    from bench import build_cloth, build_body_sphere
    from mpmavatar_tpu.core import types
    from mpmavatar_tpu.parallel import (UniformModel,
                                        make_sharded_cloth_state,
                                        make_sharded_frame, shard_state)
    from mpmavatar_tpu.sim import MPMSolver

    verts, faces = build_cloth(183, 183)
    cfg = types.MPMStaticConfig(
        n_elements=len(faces), n_traditional=0, n_vertices=len(verts),
        n_grid=128, grid_lim=2.0, material=7)
    d, rinv, evol, vvol = types.cloth_geometry(jnp.asarray(verts),
                                               jnp.asarray(faces))
    x = jnp.concatenate([jnp.asarray(verts)[faces].mean(1),
                         jnp.asarray(verts)], 0)
    state = types.make_state(cfg, x, faces=faces, d=d, R_inv=rinv,
                             vol=jnp.concatenate([evol, vvol]))
    solver = MPMSolver(cfg)
    solver.add_surface_collider([0.0, 0.1, 0.0], [0.0, 1.0, 0.0])
    bv, bf = build_body_sphere()
    tri = jnp.asarray(np.asarray(bv)[np.asarray(bf)])

    um = UniformModel(
        mu=jnp.float32(2000.0 / 2.6),
        lam=jnp.float32(2000.0 * 0.3 / (1.3 * 0.4)),
        gamma=jnp.float32(500.0), kappa=jnp.float32(500.0),
        friction_coeff=jnp.float32(np.tan(np.deg2rad(40.0))),
        gravity=jnp.asarray([0.0, -9.8, 0.0]),
        mesh_friction=jnp.float32(0.5))

    st = shard_state(mesh, make_sharded_cloth_state(cfg, state, 1))
    frame = make_sharded_frame(cfg, mesh, num_substeps=substeps, dt=1e-4,
                               grid_post=solver.colliders.grid_post,
                               with_mesh=True, column_k=96,
                               column_c_cap=4096, return_overflow=True)
    t0 = time.perf_counter()
    out, of = frame(st, um, tri, jnp.zeros_like(tri))
    sync(out.xv)
    compile_s = time.perf_counter() - t0
    assert int(np.asarray(of)[0]) == 0, "sharded on-chip overflow"
    assert np.isfinite(np.asarray(out.xv)).all(), "sharded on-chip NaN"

    t0 = time.perf_counter()
    for _ in range(reps):
        out, of = frame(st, um, tri, jnp.zeros_like(tri))
    sync(out.xv)
    sharded_sps = reps * substeps / (time.perf_counter() - t0)

    # unsharded comparison on the SAME scene/knobs (bench.py path)
    import jax
    solver2 = MPMSolver(cfg, column_k=96, mesh_column_k=32, faces=faces,
                        column_c_cap=4096, column_radius=1)
    solver2.add_surface_collider([0.0, 0.1, 0.0], [0.0, 1.0, 0.0])
    solver2.add_mesh_collider(bf, friction=0.5)
    solver2.adapt_mesh_cap(jnp.asarray(bv))
    run = jax.jit(lambda s: solver2.frame(
        s, types.make_model(cfg.n_particles, E=2000.0, nu=0.3),
        1e-4, substeps, 0.0, mesh_x=jnp.asarray(bv),
        mesh_v=jnp.zeros((len(bv), 3)), return_overflow=True))
    s2, _, of2 = run(state)
    sync(s2.x)
    assert int(of2) == 0
    t0 = time.perf_counter()
    for _ in range(reps):
        s2, _, of2 = run(state)
    sync(s2.x)
    unsharded_sps = reps * substeps / (time.perf_counter() - t0)
    return {"sharded_frame_substeps_per_sec": round(sharded_sps, 2),
            "unsharded_substeps_per_sec": round(unsharded_sps, 2),
            "sharded_overhead_pct": round(
                100.0 * (unsharded_sps / sharded_sps - 1.0), 1),
            "sharded_compile_sec": round(compile_s, 1)}


def appearance_check(mesh, reps=5):
    import jax
    import jax.numpy as jnp
    from bench_appearance import build_avatar
    from mpmavatar_tpu.data.config import OptimizationParams
    from mpmavatar_tpu.parallel.appearance_dp import (
        make_dp_appearance_step, shard_batch, stack_camera_arrays)
    from mpmavatar_tpu.render import gaussians as G
    from mpmavatar_tpu.render.cameras import Camera
    from mpmavatar_tpu.train.appearance import make_optimizer

    w, h = 1500, 1000
    avatar, params, n_faces = build_avatar()
    opt = OptimizationParams()
    tx = make_optimizer(opt, 1.0)
    opt_state = tx.init(params)
    ds = G.init_densify_state(params.splats.capacity)
    k = np.array([[1400.0, 0, w / 2], [0, 1400.0, h / 2], [0, 0, 1.0]])
    w2c = np.eye(4)
    w2c[2, 3] = 2.6
    cams = [Camera.from_kw2c("c0", w, h, k, w2c, near=0.1, far=20.0)]
    rng = np.random.default_rng(0)
    batch = (stack_camera_arrays(cams),
             jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
             jnp.asarray(avatar.verts_orig[0])[None],
             jnp.asarray(avatar.ao_maps[0])[None],
             jnp.asarray(rng.random((1, 3, h, w)).astype(np.float32)),
             jnp.ones((1, 1, h, w), jnp.float32))
    step = make_dp_appearance_step(avatar, opt, tx, mesh, 3, False, w, h,
                                   tile_capacity=512, work_cap=8192)
    t0 = time.perf_counter()
    params, opt_state, ds, loss, metrics = step(
        params, opt_state, ds, *shard_batch(mesh, batch))
    sync(params.cam_m)
    compile_s = time.perf_counter() - t0
    assert np.isfinite(float(loss)), "DP appearance on-chip NaN"
    t0 = time.perf_counter()
    for _ in range(reps):
        params, opt_state, ds, loss, metrics = step(
            params, opt_state, ds, *shard_batch(mesh, batch))
    sync(params.cam_m)
    float(loss)
    dp_sps = reps / (time.perf_counter() - t0)
    return {"dp_appearance_steps_per_sec": round(dp_sps, 2),
            "dp_appearance_compile_sec": round(compile_s, 1),
            "dp_appearance_loss": round(float(loss), 4)}


def main():
    from mpmavatar_tpu.utils import compile_cache
    compile_cache.setup()
    import jax
    from jax.sharding import Mesh

    dev = jax.devices()[0]
    mesh = Mesh(np.array(jax.devices()[:1]), ("dp",))
    out = {"device": str(dev.platform), "device_kind": str(dev.device_kind)}
    out.update(sim_check(mesh))
    out.update(appearance_check(mesh))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
