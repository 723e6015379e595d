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
                                          prepare_pose_playback)
    from mpmavatar_tpu.utils.io import read_obj, write_obj

    parser = argparse.ArgumentParser()
    parser.add_argument("--cloth_obj", required=True,
                        help="garment mesh at the first tracked frame")
    parser.add_argument("--body_obj", required=True,
                        help="static body collider mesh (first frame)")
    parser.add_argument("--chair_obj", default=None)
    parser.add_argument("--chair_gs", default=None,
                        help="chair gaussians (npz or 3DGS ply) for the "
                        "orbit render (run_demo.py:575)")
    parser.add_argument("--out_dir", default="./output/demo")
    parser.add_argument("--num_frames", type=int, default=60)
    parser.add_argument("--extra_frames", type=int, default=130,
                        help="frames simulated past the pose sequence "
                        "(run_demo.py:214)")
    parser.add_argument("--grid_size", type=int, default=250)
    parser.add_argument("--substep", type=int, default=400)
    parser.add_argument("--num_joint_v", type=int, default=0,
                        help="leading cloth verts pinned to the body "
                        "(joint band)")
    parser.add_argument("--num_joint_f", type=int, default=0)
    parser.add_argument("--sand_release_frame", type=int, default=100,
                        help="frame at which sand starts releasing "
                        "(run_demo.py:525)")
    # pose playback (run_demo.py:176-214): animate the avatar into the
    # demo pose sequence via inverse+forward LBS
    parser.add_argument("--smplx_model_npz", default=None)
    parser.add_argument("--first_smplx_npz", default=None,
                        help="SMPL-X fit of the first tracked frame")
    parser.add_argument("--pose_npz", default=None,
                        help="pose sequence npz (a1_sitting.npz layout)")
    parser.add_argument("--lbs_w_npy", default=None)
    parser.add_argument("--avatar_dir", default=None,
                        help="tracking dir (params_*.npz) to render with")
    parser.add_argument("--avatar_ckpt", default=None,
                        help="appearance checkpoint dir")
    parser.add_argument("--uv_path", default=None)
    parser.add_argument("--skip_video", action="store_true")
    args = parser.parse_args()

    cloth_v, cloth_f = read_obj(args.cloth_obj)
    body_v, body_f = read_obj(args.body_obj)

    # --- optional pose playback: per-frame body + cloth-joint motion ----
    playback = None
    if args.pose_npz:
        assert args.smplx_model_npz and args.first_smplx_npz, \
            "--pose_npz needs --smplx_model_npz and --first_smplx_npz"
        from mpmavatar_tpu.avatar.smplx import load_smplx_npz
        smplx_model = load_smplx_npz(args.smplx_model_npz)
        first_params = {k: jnp.asarray(v)
                        for k, v in np.load(args.first_smplx_npz).items()}
        pose_params = {k: jnp.asarray(v)
                       for k, v in np.load(args.pose_npz).items()}
        lbs_w = (jnp.asarray(np.load(args.lbs_w_npy))
                 if args.lbs_w_npy else None)
        playback = prepare_pose_playback(smplx_model, first_params,
                                         pose_params, cloth_v,
                                         lbs_w=lbs_w)
        n_pose = int(playback["verts"].shape[0])
        args.num_frames = n_pose + args.extra_frames
        body_v = np.asarray(playback["smplx"][0])
        print(f"pose playback: {n_pose} poses + {args.extra_frames} "
              f"extra frames", flush=True)

    n_body = len(body_v)
    if args.chair_obj:
        chair_v, chair_f = read_obj(args.chair_obj)
        body_f = np.concatenate([body_f, chair_f + n_body])
        body_v = np.concatenate([body_v, chair_v])
    n_chair = len(body_v) - n_body

    sand, sand_vol = get_sand()
    tf = SimTransform.from_verts(cloth_v)
    cfg, state, model, solver = build_demo_sim(
        cloth_v, cloth_f, sand, sand_vol, body_v, body_f, tf,
        grid_size=args.grid_size, num_joint_v=args.num_joint_v,
        num_joint_f=args.num_joint_f)
    if playback is not None:
        # size the mesh-splat cap over the whole pose sequence so the
        # animated collider never trips the overflow check mid-run
        seq = [np.asarray(tf.wld2sim(jnp.asarray(np.concatenate(
            [np.asarray(playback["smplx"][k])]
            + ([body_v[n_body:]] if n_chair else []), 0))))
            for k in range(0, playback["smplx"].shape[0], 8)]
        solver.calibrate_caps(mesh_xs=seq, sample_every=1)
    # gradual sand release after the avatar is seated (run_demo.py:524)
    release_t0 = args.sand_release_frame / 25.0
    solver.release_particles_sequentially(
        state, [0.0, 0.0, 1.0],
        float(np.asarray(tf.wld2sim(jnp.asarray(sand)))[:, 2].max()),
        float(np.asarray(tf.wld2sim(jnp.asarray(sand)))[:, 2].min()),
        start_time=release_t0,
        end_time=release_t0 + (args.num_frames
                               - args.sand_release_frame) / 25.0)

    os.makedirs(os.path.join(args.out_dir, "uvmesh"), exist_ok=True)
    os.makedirs(os.path.join(args.out_dir, "sand"), exist_ok=True)
    dt = (1.0 / 25.0) / args.substep
    zeros_chair = jnp.zeros((n_chair, 3), jnp.float32)
    t = 0.0
    for i in range(args.num_frames):
        if playback is not None:
            n_pose = playback["smplx"].shape[0]
            idx = min(i, n_pose - 1)
            bx = playback["smplx"][idx]
            bv = (playback["smplx_velo"][i] if i < n_pose - 1
                  else jnp.zeros_like(bx))
            mesh_x = jnp.concatenate(
                [tf.wld2sim(bx)] + ([tf.wld2sim(jnp.asarray(
                    body_v[n_body:]))] if n_chair else []), 0)
            mesh_v = jnp.concatenate(
                [bv * tf.scale] + ([zeros_chair] if n_chair else []), 0)
            jv = jf = None
            if args.num_joint_v:
                jv = (playback["verts_velo"][i, :args.num_joint_v]
                      if i < n_pose - 1 else
                      jnp.zeros((args.num_joint_v, 3))) * tf.scale
                jf = jv[jnp.asarray(cloth_f[:args.num_joint_f])].mean(1)
        else:
            mesh_x = tf.wld2sim(jnp.asarray(body_v))
            mesh_v = jnp.zeros_like(mesh_x)
            jv = jf = None
        state, t, of = solver.frame(state, model, dt, args.substep, t,
                                    mesh_x=mesh_x, mesh_v=mesh_v,
                                    joint_verts_v=jv, joint_faces_v=jf,
                                    return_overflow=True)
        solver.check_overflow(of, context=f"demo frame {i}")
        solver.check_finite(state, context=f"demo frame {i}")
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

    chair = chair_shs = None
    if args.chair_gs:
        from mpmavatar_tpu.train.demo import load_chair_gaussians
        chair, chair_shs = load_chair_gaussians(args.chair_gs)

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
        # sand renders unconditionally (reference run_demo.py:575-601);
        # chair gaussians are a separate optional overlay
        img, _ = render_demo_frame(
            avatar, params, jnp.asarray(verts), ao, cams[i], 0,
            sand_xyz=jnp.asarray(sand) if len(sand) else None,
            chair=chair, chair_shs=chair_shs)
        arr = (np.clip(np.asarray(img).transpose(1, 2, 0), 0, 1)
               * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, f"{i:04d}.png"))
    if not args.skip_video:
        frames_to_video(os.path.join(img_dir, "%04d.png"),
                        os.path.join(args.out_dir, "video", "video.mp4"))


if __name__ == "__main__":
    main()
