#!/usr/bin/env python
"""Zero-shot interaction demo CLI (chair + poured sand + orbit render).

Equivalent of /root/reference/run_demo.py."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import numpy as np
    import jax.numpy as jnp

    from mpmavatar_tpu.sim import SimTransform
    from mpmavatar_tpu.train.demo import (build_demo_sim, get_sand,
                                          get_spherical_cam)
    from mpmavatar_tpu.utils.io import read_obj, write_obj

    parser = argparse.ArgumentParser()
    parser.add_argument("--cloth_obj", required=True)
    parser.add_argument("--body_obj", required=True)
    parser.add_argument("--chair_obj", default=None)
    parser.add_argument("--out_dir", default="./output/demo")
    parser.add_argument("--num_frames", type=int, default=60)
    parser.add_argument("--grid_size", type=int, default=250)
    parser.add_argument("--substep", type=int, default=400)
    parser.add_argument("--avatar_dir", default=None,
                        help="tracking dir (params_*.npz) to render with")
    parser.add_argument("--avatar_ckpt", default=None,
                        help="appearance checkpoint dir")
    parser.add_argument("--uv_path", default=None)
    parser.add_argument("--skip_video", action="store_true")
    args = parser.parse_args()

    cloth_v, cloth_f = read_obj(args.cloth_obj)
    body_v, body_f = read_obj(args.body_obj)
    if args.chair_obj:
        chair_v, chair_f = read_obj(args.chair_obj)
        body_f = np.concatenate([body_f, chair_f + len(body_v)])
        body_v = np.concatenate([body_v, chair_v])

    sand, sand_vol = get_sand()
    tf = SimTransform.from_verts(cloth_v)
    cfg, state, model, solver = build_demo_sim(
        cloth_v, cloth_f, sand, sand_vol, body_v, body_f, tf,
        grid_size=args.grid_size)
    # gradual sand release (run_demo.py:524)
    solver.release_particles_sequentially(
        state, [0.0, 0.0, 1.0],
        float(np.asarray(tf.wld2sim(jnp.asarray(sand)))[:, 2].max()),
        float(np.asarray(tf.wld2sim(jnp.asarray(sand)))[:, 2].min()),
        start_time=0.0, end_time=args.num_frames / 25.0)

    os.makedirs(os.path.join(args.out_dir, "uvmesh"), exist_ok=True)
    os.makedirs(os.path.join(args.out_dir, "sand"), exist_ok=True)
    dt = (1.0 / 25.0) / args.substep
    mesh_x = tf.wld2sim(jnp.asarray(body_v))
    mesh_v = jnp.zeros_like(mesh_x)
    t = 0.0
    for i in range(args.num_frames):
        state, t = solver.frame(state, model, dt, args.substep, t,
                                mesh_x=mesh_x, mesh_v=mesh_v)
        x = np.asarray(state.x)
        cloth = np.asarray(tf.sim2wld(jnp.asarray(
            x[cfg.n_elements + cfg.n_traditional:])))
        sand_w = np.asarray(tf.sim2wld(jnp.asarray(
            x[cfg.n_elements:cfg.n_elements + cfg.n_traditional])))
        write_obj(os.path.join(args.out_dir, "uvmesh", f"{i:03d}.obj"),
                  cloth, cloth_f)
        write_obj(os.path.join(args.out_dir, "sand", f"{i:03d}.obj"),
                  sand_w)
        print(f"frame {i}: cloth y [{cloth[:, 1].min():.3f}, "
              f"{cloth[:, 1].max():.3f}]", flush=True)

    if args.avatar_dir and args.uv_path:
        render_orbit(args, cloth_f)


def render_orbit(args, cloth_f):
    """Orbit-render the simulated sequence with the trained avatar +
    extra gaussians and bake AO per frame (run_demo.py:560-613)."""
    import numpy as np
    import jax.numpy as jnp
    from PIL import Image
    from mpmavatar_tpu.render.avatar_model import (load_mesh_avatar,
                                                   load_avatar_checkpoint)
    from mpmavatar_tpu.render.cameras import Camera
    from mpmavatar_tpu.render.ao import bake_ao, rasterize_uv_chart
    from mpmavatar_tpu.render.avatar_model import load_uv_coords
    from mpmavatar_tpu.train.demo import (get_spherical_cam,
                                          render_demo_frame)
    from mpmavatar_tpu.utils.io import read_obj
    from mpmavatar_tpu.utils.misc import frames_to_video

    avatar, params = load_mesh_avatar(args.avatar_dir, args.uv_path)
    if args.avatar_ckpt:
        params = load_avatar_checkpoint(args.avatar_ckpt, params)

    # UV chart for on-TPU AO baking
    vt, fuv = [], []
    with open(args.uv_path) as f:
        for line in f:
            if line[:2] == "vt":
                vt.append([float(x) for x in line[2:].split()])
            elif line[:2] == "f ":
                fuv.append([int(p.split("/")[1]) - 1
                            for p in line[2:].split()])
    chart = rasterize_uv_chart(np.asarray(vt, np.float32),
                               np.asarray(fuv), resolution=256)

    k = np.array([[1000.0, 0, 512], [0, 1000.0, 512], [0, 0, 1]])
    ref_cam = Camera.from_kw2c("ref", 1024, 1024, k, np.eye(4))
    cams = get_spherical_cam(ref_cam, args.num_frames)

    img_dir = os.path.join(args.out_dir, "video", "frames")
    os.makedirs(img_dir, exist_ok=True)
    for i in range(args.num_frames):
        verts, _ = read_obj(
            os.path.join(args.out_dir, "uvmesh", f"{i:03d}.obj"))
        sand, _ = read_obj(
            os.path.join(args.out_dir, "sand", f"{i:03d}.obj"))
        ao = bake_ao(jnp.asarray(verts), jnp.asarray(avatar.faces),
                     jnp.asarray(chart.face_idx), jnp.asarray(chart.bary),
                     jnp.asarray(chart.texel_ij))
        img, _ = render_demo_frame(
            avatar, params, jnp.asarray(verts), ao, cams[i], 0,
            sand_xyz=jnp.asarray(sand) if i > args.num_frames // 2
            else None)
        arr = (np.clip(np.asarray(img).transpose(1, 2, 0), 0, 1)
               * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, f"{i:04d}.png"))
    if not args.skip_video:
        frames_to_video(os.path.join(img_dir, "%04d.png"),
                        os.path.join(args.out_dir, "video", "video.mp4"))


if __name__ == "__main__":
    main()
