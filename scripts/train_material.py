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
    parser.add_argument("--config", type=str, default=None,
                        help="JSON config (scripts/configs/*.json) whose "
                             "values become flag defaults; explicit CLI "
                             "flags still override — the layered "
                             "upper/lower passes are driven this way "
                             "(scripts/physics/4ddress_s170_*.sh parity)")
    parser.add_argument("--run_eval", action="store_true")
    parser.add_argument("--skip_sim", action="store_true",
                        help="eval: reuse existing uvmesh/*.obj")
    parser.add_argument("--skip_render", action="store_true",
                        help="eval: stop after simulation (no AO/render)")
    parser.add_argument("--skip_video", action="store_true")
    parser.add_argument("--tracked_verts_npz", type=str, required=True,
                        help="npz with train_verts (F+1,V,3), smplx_verts, "
                             "smplx_faces, cloth_faces, first_frame_verts, "
                             "num_joint_v, num_joint_f; optional "
                             "human_verts + cloth_v_idx/human_v_idx for "
                             "layered merge")
    pre, _ = parser.parse_known_args()
    if pre.config:
        import json
        with open(pre.config) as f:
            overrides = json.load(f)
        known = {a.dest for a in parser._actions}
        bad = sorted(set(overrides) - known)
        if bad:
            parser.error(f"unknown config keys in {pre.config}: {bad}")
        parser.set_defaults(**overrides)
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
        mesh_dir = os.path.join(out_dir, "uvmesh")
        test = np.load(args.tracked_verts_npz.replace("train", "test"))
        if not args.skip_sim:
            verts0 = test["train_verts"][0]
            velo0 = (test["train_verts"][1] - test["train_verts"][0]) * 25.0
            smplx = test["smplx_verts"]
            smplx_velo = (smplx[1:] - smplx[:-1]) * 25.0
            frames = trainer.simulate(verts0, velo0, smplx[:-1],
                                      smplx_velo, n_frames=len(smplx) - 1)
            frames = [test["train_verts"][0]] + frames
            os.makedirs(mesh_dir, exist_ok=True)
            # layered capture: merge the simulated cloth with the tracked
            # human layer before writing (train_material_params.py:812-820)
            layered = "human_verts" in test and "cloth_v_idx" in test
            for i, v in enumerate(frames):
                if layered:
                    full = np.zeros(
                        (len(test["cloth_v_idx"])
                         + len(test["human_v_idx"]), 3), np.float32)
                    full[np.asarray(test["cloth_v_idx"])] = v
                    full[np.asarray(test["human_v_idx"])] = \
                        test["human_verts"][i]
                    v = full
                write_obj(os.path.join(mesh_dir, f"{i:03d}.obj"), v,
                          data["cloth_faces"])
            print(f"wrote {len(frames)} simulated meshes to {mesh_dir}")
        if not args.skip_render:
            # stage-4 render loop: AO bake + held-out camera renders +
            # pred/gt pngs + videos (train_material_params.py:828-881);
            # scripts/eval.py consumes out_dir directly afterwards
            from mpmavatar_tpu.data import Scene
            from mpmavatar_tpu.render.avatar_model import (
                load_avatar_checkpoint, load_mesh_avatar)
            from mpmavatar_tpu.train.evaluate import render_eval_sequence
            scene = Scene(cfg, return_type="image")
            avatar, params = load_mesh_avatar(
                cfg.trained_model_path, cfg.uv_path,
                sh_degree=cfg.sh_degree)
            ckpt = os.path.join(cfg.model_path, "point_cloud")
            if os.path.isdir(ckpt):
                latest = sorted(os.listdir(ckpt))[-1]
                params = load_avatar_checkpoint(
                    os.path.join(ckpt, latest), params)
            render_eval_sequence(avatar, params, scene, mesh_dir,
                                 out_dir, cfg.uv_path,
                                 active_sh_degree=cfg.sh_degree,
                                 skip_video=args.skip_video)
            print(f"eval renders written under {out_dir}")
        return

    for it in range(opt.iterations):
        loss, p = trainer.train_one_step()
        print(f"step {it} loss {loss:.6f} D {p['D']:.3f} "
              f"E {p['E'] * 100:.1f} H {p['H']:.3f}", flush=True)
        if it % opt.log_iters == opt.log_iters - 1:
            trainer.save(out_dir)


if __name__ == "__main__":
    main()
