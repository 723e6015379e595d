#!/usr/bin/env python
"""Stage-3 material estimation + stage-4 simulation CLI.

Equivalent of /root/reference/train_material_params.py (train + --run_eval
paths), with true autodiff gradients through the MPM rollout."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import numpy as np

    from mpmavatar_tpu.data import (ModelParams, OptimizationParams,
                                    add_dataclass_args, extract_dataclass)
    from mpmavatar_tpu.train.material import (MaterialTrainer,
                                              MaterialTrainerConfig)
    from mpmavatar_tpu.utils.io import read_obj, write_obj

    parser = argparse.ArgumentParser()
    add_dataclass_args(parser, ModelParams)
    add_dataclass_args(parser, OptimizationParams)
    parser.add_argument("--run_eval", action="store_true")
    parser.add_argument("--tracked_verts_npz", type=str, required=True,
                        help="npz with train_verts (F+1,V,3), smplx_verts, "
                             "smplx_faces, cloth_faces, first_frame_verts, "
                             "num_joint_v, num_joint_f")
    args = parser.parse_args()
    cfg = extract_dataclass(args, ModelParams)
    opt = extract_dataclass(args, OptimizationParams)

    data = np.load(args.tracked_verts_npz)
    mt_cfg = MaterialTrainerConfig(
        grid_size=cfg.grid_size, substep=cfg.substep,
        init_D=cfg.init_D, init_E=cfg.init_E, init_nu=cfg.init_nu,
        init_gamma=cfg.init_gamma, init_kappa=cfg.init_kappa,
        friction_angle=cfg.friction_angle,
        mesh_friction_coeff=cfg.mesh_friction_coeff,
        min_D=cfg.min_D, max_D=cfg.max_D, min_E=cfg.min_E, max_E=cfg.max_E,
        min_H=cfg.min_H, max_H=cfg.max_H,
        lr_D=opt.lr_D, lr_E=opt.lr_E, lr_H=opt.lr_H,
        iterations=opt.iterations)
    trainer = MaterialTrainer(
        mt_cfg, data["cloth_faces"], data["first_frame_verts"],
        data["train_verts"], data["smplx_verts"], data["smplx_faces"],
        int(data["num_joint_v"]), int(data["num_joint_f"]))

    out_dir = cfg.output_dir or "./output/material"
    if args.run_eval:
        test = np.load(args.tracked_verts_npz.replace("train", "test"))
        verts0 = test["train_verts"][0]
        velo0 = (test["train_verts"][1] - test["train_verts"][0]) * 25.0
        smplx = test["smplx_verts"]
        smplx_velo = (smplx[1:] - smplx[:-1]) * 25.0
        frames = trainer.simulate(verts0, velo0, smplx[:-1], smplx_velo,
                                  n_frames=len(smplx) - 1)
        mesh_dir = os.path.join(out_dir, "uvmesh")
        os.makedirs(mesh_dir, exist_ok=True)
        for i, v in enumerate(frames):
            write_obj(os.path.join(mesh_dir, f"{i:03d}.obj"), v,
                      data["cloth_faces"])
        print(f"wrote {len(frames)} simulated meshes to {mesh_dir}")
        return

    for it in range(opt.iterations):
        loss, p = trainer.train_one_step()
        print(f"step {it} loss {loss:.6f} D {p['D']:.3f} "
              f"E {p['E'] * 100:.1f} H {p['H']:.3f}", flush=True)
        if it % opt.log_iters == opt.log_iters - 1:
            trainer.save(out_dir)


if __name__ == "__main__":
    main()
