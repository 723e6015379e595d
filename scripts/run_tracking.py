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
    parser.add_argument("--resume_t", type=int, default=0)
    args = parser.parse_args()
    cfg = extract_dataclass(args, ModelParams)

    scene = Scene(cfg, return_type="image")
    ds = scene.train_dataset
    verts, faces = read_obj(args.template_obj)
    cloth_v_idx = None
    if args.cloth_obj and os.path.exists(args.cloth_obj):
        _, cloth_faces = read_obj(args.cloth_obj)
        cloth_v_idx = np.unique(cloth_faces.reshape(-1))

    tcfg = TrackingConfig(iters_first=args.iters_first,
                          iters_rest=args.iters_rest)
    tracker = MeshTracker(verts, faces, tcfg, cloth_v_idx=cloth_v_idx,
                          max_cams=len(ds.camera_list),
                          scene_radius=ds.scene_radius)
    os.makedirs(args.out_dir, exist_ok=True)

    n_frames = len(ds.frame_index)
    for t in range(args.resume_t, n_frames):
        batches = [ds.load_frame(ci, t)
                   for ci in range(len(ds.camera_list))]
        # body surface for the collision penalty: approximate with the
        # current template when no SMPL-X fit is supplied
        body_pts, body_normals = sample_mesh_surface(
            np.asarray(tracker.params["vertices"]), faces, count=4096,
            seed=t)
        if t > args.resume_t:
            tracker.initialize_per_timestep()
        losses = tracker.fit_frame(batches, body_pts, body_normals,
                                   is_initial=(t == args.resume_t))
        tracker.save_frame(os.path.join(args.out_dir, f"params_{t}.npz"),
                           t)
        print(f"frame {t}: loss {losses[-1]:.5f}", flush=True)


if __name__ == "__main__":
    main()
