#!/usr/bin/env python
"""Stage-3 (inverse material estimation) at PRODUCTION scale on the TPU.

Two modes (VERDICT r4 item 2):

  --bench    time ONE jax.value_and_grad step through >= 1 frame x 400
             substeps at grid 200^3 with a ~100k-particle garment
             (matches /root/reference/train_material_params.py:571-670's
             per-step workload shape, minus its 4x finite-difference
             rollouts) and print a JSON line with material_grad_step_sec.

  --recover  plant (D*, E*, H*), synthesize a tracked trajectory with
             the solver itself at production grid/substeps on a
             >= 25k-vertex hanging cloth, then recover the parameters
             from the reference's default init; writes the convergence
             trace to --out.

Run on the real chip:  python scripts/stage3_production.py --bench
                       python scripts/stage3_production.py --recover
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

TRUTH = {"D": 1.8, "E": 3.0, "H": 1.08}


def hanging_cloth(nx, ny, width=0.8, height=0.8, tilt=0.35):
    """Vertical tilted sheet, top row first (pinned prefix convention);
    vertical so H (rest-shape y scale) is identifiable — see
    tests/test_inverse_recovery.py."""
    xs = np.linspace(1.0 - width / 2, 1.0 + width / 2, ny)
    fr = np.linspace(0.0, 1.0, nx)[:, None]
    verts = np.zeros((nx, ny, 3), np.float32)
    verts[..., 0] = xs[None, :]
    verts[..., 1] = 1.5 - height * fr
    verts[..., 2] = 1.0 + tilt * height * fr
    verts = verts.reshape(-1, 3)
    idx = np.arange(nx * ny).reshape(nx, ny)
    a, b = idx[:-1, :-1].ravel(), idx[:-1, 1:].ravel()
    c, d = idx[1:, :-1].ravel(), idx[1:, 1:].ravel()
    faces = np.concatenate([np.stack([a, b, c], -1),
                            np.stack([b, d, c], -1)], 0).astype(np.int32)
    return verts, faces


def make_trainer(nx, ny, grid, substep, n_frames, iterations,
                 train_verts=None, lr_scale=1.0):
    from bench import build_body_sphere
    from mpmavatar_tpu.train.material import (MaterialTrainer,
                                              MaterialTrainerConfig)
    verts, faces = hanging_cloth(nx, ny)
    bv, bf = build_body_sphere(n_theta=32, n_phi=32,
                               center=(1.0, 0.75, 1.2), r=0.22)
    body_seq = np.repeat(bv[None], n_frames + 1, 0)
    cfg = MaterialTrainerConfig(
        grid_size=grid, substep=substep, iterations=iterations,
        init_D=1.0, init_E=100.0,
        lr_D=0.02 * lr_scale, lr_E=0.06 * lr_scale,
        lr_H=0.004 * lr_scale)
    if train_verts is None:
        train_verts = np.repeat(verts[None], n_frames + 1, 0)
    tr = MaterialTrainer(cfg, faces, first_frame_verts=verts,
                         train_verts=train_verts, smplx_verts=body_seq,
                         smplx_faces=bf, num_joint_v=ny, num_joint_f=0)
    return tr, verts, faces, body_seq, bf


def sync(x):
    # honest fence: device->host readback (block_until_ready can return
    # early on this runtime — bench.py discipline)
    return float(np.asarray(x).ravel()[0])


def run_bench(args):
    """material_grad_step_sec at the reference's stage-3 shape."""
    import jax.numpy as jnp
    # ~100k particles: 183x183 verts (33.5k) + 66.2k faces
    tr, verts, faces, *_ = make_trainer(
        nx=args.nx, ny=args.nx, grid=args.grid, substep=args.substep,
        n_frames=args.frames, iterations=10)
    n_part = tr.static.n_particles
    print(f"particles={n_part} grid={args.grid} substep={args.substep} "
          f"frames={args.frames}", file=sys.stderr)

    # forward-only rollout for the grad/forward cost ratio
    import jax
    fwd = jax.jit(lambda p: tr._rollout_loss_fn(p, tr._rollout_data))

    t0 = time.perf_counter()
    (l, of), g = tr._rollout_loss(tr.params)
    sync(l), sync(g["D"])
    compile_grad = time.perf_counter() - t0
    tr.solver.check_overflow(of, "grad bench")
    assert np.isfinite(float(l)), "rollout loss is not finite"
    assert all(np.isfinite(float(v)) for v in g.values()), g

    reps = args.reps
    t0 = time.perf_counter()
    for _ in range(reps):
        (l, of), g = tr._rollout_loss(tr.params)
    sync(l), sync(g["D"])
    grad_sec = (time.perf_counter() - t0) / reps

    (lf, _) = fwd(tr.params)
    sync(lf)
    t0 = time.perf_counter()
    for _ in range(reps):
        (lf, _) = fwd(tr.params)
    sync(lf)
    fwd_sec = (time.perf_counter() - t0) / reps

    n_sub = args.frames * args.substep
    out = {
        "metric": "material_grad_step_sec",
        "value": round(grad_sec, 3), "unit": "s",
        "particles": n_part, "grid": args.grid,
        "frames": args.frames, "substeps_per_frame": args.substep,
        "forward_rollout_sec": round(fwd_sec, 3),
        "grad_over_forward": round(grad_sec / fwd_sec, 2),
        "grad_substeps_per_sec": round(n_sub / grad_sec, 2),
        "compile_sec": round(compile_grad, 1),
        "grads": {k: float(v) for k, v in g.items()},
    }
    if not getattr(args, "quiet", False):
        print(json.dumps(out))
    return out


def run_recover(args):
    """Plant TRUTH, synthesize, recover; write the convergence trace."""
    import jax.numpy as jnp
    n_frames = args.frames
    gen, verts, faces, body_seq, bf = make_trainer(
        nx=args.nx, ny=args.nx, grid=args.grid, substep=args.substep,
        n_frames=n_frames, iterations=args.steps)
    print(f"particles={gen.static.n_particles} verts={len(verts)} "
          f"grid={args.grid} substep={args.substep} frames={n_frames}",
          file=sys.stderr)
    gen.params = {k: jnp.float32(v) for k, v in TRUTH.items()}
    zeros = np.zeros((len(verts), 3), np.float32)
    zeros_jv = jnp.zeros((gen.static.num_joint_v, 3), jnp.float32)
    t0 = time.perf_counter()
    frames = gen.simulate(
        test_verts0=verts, test_verts_velo0=zeros, test_smplx=body_seq,
        test_smplx_velo=np.zeros_like(body_seq), n_frames=n_frames,
        joint_velo_fn=lambda i: zeros_jv)
    traj = np.stack([verts] + [np.asarray(f) for f in frames], 0)
    assert np.isfinite(traj).all()
    move = np.abs(traj[-1] - traj[0]).max()
    assert move > 0.01, f"synthetic trajectory barely moves ({move})"
    print(f"synthesized {n_frames} frames in "
          f"{time.perf_counter() - t0:.1f}s, max displacement {move:.3f}",
          file=sys.stderr)

    tr, *_ = make_trainer(nx=args.nx, ny=args.nx, grid=args.grid,
                          substep=args.substep, n_frames=n_frames,
                          iterations=args.steps, train_verts=traj,
                          lr_scale=args.lr_scale)
    trace = []
    t_start = time.perf_counter()
    for it in range(args.steps):
        t0 = time.perf_counter()
        loss, params = tr.train_one_step()
        rec = {"step": it, "loss": loss,
               "sec": round(time.perf_counter() - t0, 2), **params}
        trace.append(rec)
        print(json.dumps(rec), flush=True)
    wall = time.perf_counter() - t_start
    best = tr.best["params"]
    summary = {
        "metric": "inverse_recovery_production",
        "truth": TRUTH, "best": best, "best_loss": tr.best["loss"],
        "init_loss": trace[0]["loss"],
        "steps": args.steps, "wall_sec": round(wall, 1),
        "particles": tr.static.n_particles, "grid": args.grid,
        "frames": n_frames, "substeps_per_frame": args.substep,
        "err": {k: round(abs(best[k] - TRUTH[k]), 4) for k in TRUTH},
    }
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            for rec in trace:
                f.write(json.dumps(rec) + "\n")
            f.write(json.dumps(summary) + "\n")
        print(f"trace -> {args.out}", file=sys.stderr)
    return summary


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bench", action="store_true")
    p.add_argument("--recover", action="store_true")
    p.add_argument("--grid", type=int, default=200)
    p.add_argument("--substep", type=int, default=400)
    p.add_argument("--nx", type=int, default=183,
                   help="cloth side (183 -> ~100k particles for --bench; "
                   "use 158 -> 25k verts / 74k particles for --recover)")
    p.add_argument("--frames", type=int, default=1)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--lr_scale", type=float, default=1.0)
    p.add_argument("--out", default="")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from mpmavatar_tpu.utils import compile_cache
    compile_cache.setup()
    if args.bench:
        run_bench(args)
    if args.recover:
        run_recover(args)


if __name__ == "__main__":
    main()
