#!/usr/bin/env python
"""Stage-1 mesh tracking CLI.

Equivalent of /root/reference/preprocess/train_mesh_lbs_actorshq.py: fits
the template mesh to every frame of a multi-view sequence, writing
params_{t}.npz per frame."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import numpy as np
    from mpmavatar_tpu.data import ModelParams, add_dataclass_args, \
        extract_dataclass, Scene
    from mpmavatar_tpu.train.tracking import MeshTracker, TrackingConfig
    from mpmavatar_tpu.utils.io import read_obj
    from mpmavatar_tpu.utils.metrics import sample_mesh_surface

    parser = argparse.ArgumentParser()
    add_dataclass_args(parser, ModelParams)
    parser.add_argument("--template_obj", required=True)
    parser.add_argument("--cloth_obj", default=None)
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--iters_first", type=int, default=10000)
    parser.add_argument("--iters_rest", type=int, default=3000)
    parser.add_argument("--cams_per_iter", type=int, default=1)
    parser.add_argument("--resume", action="store_true",
                        help="resume from params_{resume_t}.npz in "
                        "out_dir (train_mesh_lbs_actorshq.py:350-370)")
    parser.add_argument("--resume_t", type=int, default=0)
    parser.add_argument("--smplx_model_npz", default=None,
                        help="enable joint SMPL-X fitting through the "
                        "collision penalty (VPoser latent per frame, "
                        "betas at t0)")
    parser.add_argument("--smplx_param_dir", default=None,
                        help="per-frame initial SMPL-X fits "
                        "({t:06d}.npz with latent/body_pose/beta/...)")
    parser.add_argument("--vposer_ckpt", default=None,
                        help="VPoser TR00_E096.pt (torch) checkpoint")
    args = parser.parse_args()
    cfg = extract_dataclass(args, ModelParams)

    scene = Scene(cfg, return_type="image")
    ds = scene.train_dataset
    verts, faces = read_obj(args.template_obj)
    cloth_v_idx = None
    if args.cloth_obj and os.path.exists(args.cloth_obj):
        _, cloth_faces = read_obj(args.cloth_obj)
        cloth_v_idx = np.unique(cloth_faces.reshape(-1))

    smplx_model = vposer = smplx_faces = None
    if args.smplx_model_npz:
        from mpmavatar_tpu.avatar.smplx import load_smplx_npz
        smplx_model = load_smplx_npz(args.smplx_model_npz)
        smplx_faces = np.asarray(smplx_model.faces)
        if args.vposer_ckpt:
            from mpmavatar_tpu.avatar.vposer import load_vposer_torch
            vposer = load_vposer_torch(args.vposer_ckpt)

    tcfg = TrackingConfig(iters_first=args.iters_first,
                          iters_rest=args.iters_rest)
    tracker = MeshTracker(verts, faces, tcfg, cloth_v_idx=cloth_v_idx,
                          max_cams=len(ds.camera_list),
                          scene_radius=ds.scene_radius,
                          smplx_model=smplx_model, vposer=vposer,
                          smplx_faces=smplx_faces)
    os.makedirs(args.out_dir, exist_ok=True)

    start_t = args.resume_t if args.resume else 0
    if args.resume:
        tracker.resume(args.out_dir, 0, args.resume_t)
        print(f"resumed from timestep {args.resume_t}", flush=True)

    def load_smplx_param(t):
        import jax.numpy as jnp
        path = os.path.join(args.smplx_param_dir, f"{t:06d}.npz")
        return {k: jnp.asarray(v) for k, v in np.load(path).items()}

    n_frames = len(ds.frame_index)
    prev_smplx_param = None
    for t in range(start_t, n_frames):
        batches = [ds.load_frame(ci, t)
                   for ci in range(len(ds.camera_list))]
        is_initial = t == start_t
        if not is_initial:
            tracker.initialize_per_timestep()
        if smplx_model is not None and args.smplx_param_dir:
            # joint SMPL-X fit + inter-frame LBS re-posing of the human
            # layer (train_mesh_lbs_actorshq.py:427-469,495-519)
            param_t = load_smplx_param(t)
            if prev_smplx_param is not None:
                tracker.repose_human(prev_smplx_param, param_t)
            tracker.set_smplx_frame(param_t, is_initial)
            losses = tracker.fit_frame(batches, is_initial=is_initial)
            prev_smplx_param = tracker.finish_smplx_frame(is_initial)
            np.savez(os.path.join(args.out_dir, f"smplx_{t:06d}.npz"),
                     **{k: np.asarray(v)
                        for k, v in prev_smplx_param.items()})
        else:
            # body surface for the collision penalty: approximate with
            # the current template when no SMPL-X fit is supplied
            body_pts, body_normals = sample_mesh_surface(
                np.asarray(tracker.params["vertices"]), faces,
                count=4096, seed=t)
            losses = tracker.fit_frame(batches, body_pts, body_normals,
                                       is_initial=is_initial)
        tracker.save_frame(os.path.join(args.out_dir, f"params_{t}.npz"),
                           t)
        print(f"frame {t}: loss {losses[-1]:.5f}", flush=True)


if __name__ == "__main__":
    main()
