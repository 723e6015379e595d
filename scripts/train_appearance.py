#!/usr/bin/env python
"""Stage-2 appearance training CLI.

Equivalent of /root/reference/train_appearance.py: 30k iterations of 3DGS
+ shadow + color-calibration optimization on a tracked avatar, with
densification and periodic held-out evaluation.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from mpmavatar_tpu.data import (ModelParams, OptimizationParams,
                                    PipelineParams, Scene,
                                    add_dataclass_args, dump_config,
                                    extract_dataclass)
    from mpmavatar_tpu.render import camera_arrays
    from mpmavatar_tpu.render import gaussians as G
    from mpmavatar_tpu.render.avatar_model import (load_mesh_avatar,
                                                   save_avatar_checkpoint)
    from mpmavatar_tpu.train.appearance import (make_optimizer,
                                                make_train_step)

    parser = argparse.ArgumentParser()
    add_dataclass_args(parser, ModelParams)
    add_dataclass_args(parser, OptimizationParams)
    add_dataclass_args(parser, PipelineParams)
    parser.add_argument("--lpips_weights", type=str, default=None,
                        help="npz of LPIPS VGG weights; enables the "
                        "in-loop lambda_lpips term + test LPIPS")
    parser.add_argument("--test_iterations", type=int, nargs="+",
                        default=[7000, 30000])
    parser.add_argument("--tile_capacity", type=int, default=512)
    parser.add_argument("--work_cap", type=int, default=0,
                        help="worklist-compositor capacity (0 = plain "
                        "tile path; 8192 is the bench-proven fast "
                        "config at 1500x1000/50k)")
    parser.add_argument("--preload_device", action="store_true",
                        help="device-cache every unique (cam, frame) "
                        "image once (reference video mode, "
                        "actorshq_dataset.py:103-121, pushed to HBM): "
                        "removes the per-iteration PIL decode + "
                        "host->device transfer from the train loop")
    args = parser.parse_args()
    cfg = extract_dataclass(args, ModelParams)
    opt = extract_dataclass(args, OptimizationParams)

    from mpmavatar_tpu.utils.lpips_jax import make_lpips_fn
    lpips_fn = make_lpips_fn(args.lpips_weights)

    scene = Scene(cfg, return_type="image")
    avatar, params = load_mesh_avatar(cfg.trained_model_path, cfg.uv_path,
                                      sh_degree=cfg.sh_degree)
    spatial_lr_scale = scene.train_dataset.scene_radius
    tx = make_optimizer(opt, spatial_lr_scale)
    opt_state = tx.init(params)

    os.makedirs(cfg.model_path, exist_ok=True)
    dump_config(os.path.join(cfg.model_path, "cfg_args.json"), cfg, opt)

    rng = np.random.default_rng(opt.seed)
    active_sh = 0
    step = None
    ds = scene.train_dataset
    if args.preload_device:
        class _DevCached:
            """sample() with rgb/msk already ON DEVICE (cached once)."""
            def __init__(self, base):
                self.base = base
                self.camera_list = base.camera_list
                self.frame_index = base.frame_index
                self._cache = {}

            def sample(self, rng):
                i = int(rng.integers(len(self.camera_list)))
                j = int(rng.integers(len(self.frame_index)))
                if (i, j) not in self._cache:
                    b = self.base.load_frame(i, j)
                    b["rgb"] = jnp.asarray(b["rgb"])
                    b["msk"] = jnp.asarray(b["msk"])
                    self._cache[(i, j)] = b
                return self._cache[(i, j)]

        ds = _DevCached(ds)
    densify_state = G.init_densify_state(params.splats.capacity)
    num_faces = len(avatar.faces)
    for it in range(opt.iterations):
        if it % 1000 == 0 and active_sh < cfg.sh_degree:
            active_sh += 1          # oneupSHdegree (train_appearance.py:114)
            step = None
        if step is None:
            step = make_train_step(avatar, opt, tx, active_sh,
                                   cfg.white_bkgd, lpips_fn=lpips_fn,
                                   tile_capacity=args.tile_capacity,
                                   work_cap=args.work_cap)
        batch = ds.sample(rng)
        cam = batch["cam"]
        t = batch["frame_idx"]
        params, opt_state, loss, aux = step(
            params, opt_state, t, batch["camera_idx"], camera_arrays(cam),
            jnp.asarray(batch["rgb"]), jnp.asarray(batch["msk"]),
            jnp.asarray(avatar.ao_maps[t]),
            cam.image_width, cam.image_height)
        # densification loop (train_appearance.py:245-261); view-space
        # grads come out of the main backward pass (aux["vgrad"])
        if opt.densify_from_iter <= it < opt.densify_until_iter:
            verts = avatar.select_verts(params, t)
            frames = avatar.frames_for_verts(verts)
            densify_state = G.add_densification_stats(
                densify_state, aux["vgrad"],
                aux["radii"][:params.splats.capacity],
                aux["visible"][:params.splats.capacity])
            if it % opt.densification_interval == 0 and it > 0:
                # size_threshold=20 px after the first opacity reset
                # (train_appearance.py:251-252)
                size_thr = 20.0 if it > opt.opacity_reset_interval else None
                splats, densify_state = G.densify_and_prune(
                    params.splats, densify_state, frames, num_faces,
                    opt.densify_grad_threshold, 0.005,
                    scene.train_dataset.scene_radius,
                    percent_dense=opt.percent_dense,
                    key=jax.random.PRNGKey(it),
                    max_screen_size=size_thr)
                import dataclasses as _dc
                params = _dc.replace(params, splats=splats)
            if (it % opt.opacity_reset_interval == 0 and it > 0) or (
                    cfg.white_bkgd and it == opt.densify_from_iter):
                # white-background runs reset once more at densify start
                # (train_appearance.py:254-255)
                import dataclasses as _dc
                params = _dc.replace(
                    params, splats=G.reset_opacity(params.splats))
        if it % 100 == 0:
            big_of = int(aux["big_overflow"])
            work_of = int(aux["work_overflow"])
            msg = (f"iter {it} loss {float(loss):.5f} "
                   f"l1 {float(aux['l1']):.5f} "
                   f"lpips {float(aux['lpips']):.5f} "
                   f"alive {int(np.asarray(params.splats.alive).sum())}")
            if big_of or work_of:
                msg += (f"  WARNING rasterizer overflow big={big_of} "
                        f"work={work_of} — raise capacities")
            print(msg, flush=True)
        if (it + 1) in args.test_iterations:
            from mpmavatar_tpu.train.appearance import evaluate_appearance
            metrics = evaluate_appearance(
                avatar, params, scene.test_dataset,
                scene.test_camera_index, active_sh, cfg.white_bkgd,
                lpips_fn=lpips_fn)
            print(f"[iter {it + 1}] test "
                  + " ".join(f"{k} {v:.5f}" for k, v in metrics.items()),
                  flush=True)
        if it in (7000, opt.iterations - 1):
            out = os.path.join(cfg.model_path, "point_cloud",
                               f"timestep_{it:06d}")
            save_avatar_checkpoint(out, params, avatar)
            print("saved", out)


if __name__ == "__main__":
    main()
