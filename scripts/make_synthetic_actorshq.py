#!/usr/bin/env python
"""Synthesize an ActorsHQ-format dataset at production scale for the
full stage-2 training run (VERDICT r4 item 1).

Builds a ~50k-face body mesh with per-frame motion, a TEACHER avatar
with structured SH colors rendered through the repo's own rasterizer +
shadow pipeline, and writes:

  <out>/tracked/params_{t}.npz + aomap/ + uv.obj   (stage-1 artifacts;
       student colors start at gray — the teacher pattern must be
       LEARNED, mesh_gaussian_model.py:30-120 inputs)
  <out>/dataset/a1_s1/cam_info.json                (ActorsHQ layout)
  <out>/dataset/ActorsHQ/Actor01/Sequence1/4x/{rgbs,masks}/CamXXX/...

Run on the chip (renders n_cams x n_frames GT images):
  python scripts/make_synthetic_actorshq.py --out output/synth_a1
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def ring_cameras(n, radius=2.6, width=1500, height=1000, f=1400.0,
                 y=0.0):
    """n cameras on a horizontal ring looking at the origin; returns
    (ids, K, c2w) lists (ActorsHQ cam_info.json fields)."""
    cams = []
    for i in range(n):
        ang = 2 * np.pi * i / n
        pos = np.array([radius * np.sin(ang), y, radius * np.cos(ang)])
        fwd = -pos / np.linalg.norm(pos)            # +z looks at origin
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        true_up = np.cross(fwd, right)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2] = right, -true_up, fwd
        c2w[:3, 3] = pos
        k = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1.0]])
        cams.append((f"Cam{i:03d}", k, c2w))
    return cams


def smooth_ao(res, seed, n_blobs=24, lo=0.35, hi=0.98):
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.linspace(0, 1, res), np.linspace(0, 1, res),
                         indexing="ij")
    img = np.zeros((res, res))
    for _ in range(n_blobs):
        cx, cy = rng.random(2)
        s = 0.05 + 0.15 * rng.random()
        img -= rng.random() * np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2)
                                     / (2 * s * s))
    img = (img - img.min()) / max(img.max() - img.min(), 1e-9)
    return (lo + (hi - lo) * img).astype(np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="output/synth_a1")
    p.add_argument("--n_frames", type=int, default=4)
    p.add_argument("--n_cams", type=int, default=9,
                   help="last camera = held-out test view")
    p.add_argument("--width", type=int, default=1500)
    p.add_argument("--height", type=int, default=1000)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from mpmavatar_tpu.utils import compile_cache
    compile_cache.setup()

    import dataclasses
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from bench_appearance import build_body_mesh
    from mpmavatar_tpu.render.avatar_model import load_mesh_avatar
    from mpmavatar_tpu.render.cameras import Camera
    from mpmavatar_tpu.render.sh import rgb2sh
    from mpmavatar_tpu.train.appearance import render_avatar_frame

    tracked = os.path.join(args.out, "tracked")
    ds_root = os.path.join(args.out, "dataset")
    img_root = os.path.join(ds_root, "ActorsHQ", "Actor01", "Sequence1",
                            "4x")
    os.makedirs(os.path.join(tracked, "aomap"), exist_ok=True)
    os.makedirs(os.path.join(ds_root, "a1_s1"), exist_ok=True)

    # ---- mesh + per-frame motion (gentle bend, body-scale) -----------
    verts, faces = build_body_mesh(n_theta=160, n_phi=158)
    n_frames = args.n_frames
    frames_v = []
    for t in range(n_frames):
        ph = 2 * np.pi * t / max(n_frames, 1)
        v = verts.copy()
        # lateral sway + breathing, amplitude ~2 cm
        v[:, 0] += 0.02 * np.sin(ph) * (v[:, 1] / 0.85)
        v[:, 2] += 0.01 * np.cos(ph) * (v[:, 1] / 0.85) ** 2
        frames_v.append(v.astype(np.float32))

    # ---- stage-1 artifacts (student init: GRAY colors) ----------------
    for t in range(n_frames):
        np.savez(os.path.join(tracked, f"params_{t}.npz"),
                 vertices=frames_v[t], faces=faces,
                 rgb_colors=np.full((len(faces), 3), 0.5, np.float32),
                 cam_m=np.zeros((args.n_cams, 3), np.float32),
                 cam_c=np.zeros((args.n_cams, 3), np.float32))
        Image.fromarray((smooth_ao(256, seed=100 + t) * 255).astype(
            np.uint8)).save(os.path.join(tracked, "aomap",
                                         f"mesh_cloth_{t}.png"))
    # UV template: spherical chart (theta, phi) per vertex
    theta = np.arccos(np.clip(verts[:, 1] / (np.linalg.norm(
        verts, axis=1) + 1e-9), -1, 1))
    phi = np.arctan2(verts[:, 2], verts[:, 0])
    vt = np.stack([(phi + np.pi) / (2 * np.pi), 1.0 - theta / np.pi], -1)
    uv_path = os.path.join(tracked, "uv.obj")
    with open(uv_path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.5f} {v[1]:.5f} {v[2]:.5f}\n")
        for t2 in vt:
            f.write(f"vt {t2[0]:.5f} {t2[1]:.5f}\n")
        for fc in faces:
            f.write(f"f {fc[0]+1}/{fc[0]+1} {fc[1]+1}/{fc[1]+1} "
                    f"{fc[2]+1}/{fc[2]+1}\n")

    # ---- teacher avatar: structured colors the student must learn ----
    avatar, params = load_mesh_avatar(tracked, uv_path, sh_degree=3)
    centers = verts[faces].mean(1)
    pat = 0.5 + 0.45 * np.stack([
        np.sin(9.0 * centers[:, 1] + 2.0 * centers[:, 0]),
        np.sin(7.0 * centers[:, 0] + 11.0 * centers[:, 2]),
        np.cos(8.0 * centers[:, 2] + 5.0 * centers[:, 1])], -1)
    cap = params.splats.capacity
    dc = np.zeros((cap, 1, 3), np.float32)
    dc[:len(faces), 0] = np.asarray(rgb2sh(jnp.asarray(
        pat.astype(np.float32))))
    rng = np.random.default_rng(7)
    rest = np.zeros((cap, 15, 3), np.float32)
    rest[:len(faces)] = 0.03 * rng.standard_normal(
        (len(faces), 15, 3)).astype(np.float32)
    # solid surface: teacher opacity 0.9
    opa = np.full((cap, 1), float(np.log(0.9 / 0.1)), np.float32)
    teacher = dataclasses.replace(
        params, splats=dataclasses.replace(
            params.splats, features_dc=jnp.asarray(dc),
            features_rest=jnp.asarray(rest), opacity=jnp.asarray(opa)))

    # ---- cameras + GT renders -----------------------------------------
    cams = ring_cameras(args.n_cams, width=args.width, height=args.height)
    cam_info = {}
    for cid, k, c2w in cams:
        cam_info[cid] = {"K": k.tolist(), "W": args.width,
                         "H": args.height, "RT": c2w.tolist()}
    with open(os.path.join(ds_root, "a1_s1", "cam_info.json"), "w") as f:
        json.dump(cam_info, f)

    bg = jnp.zeros(3)
    for ci, (cid, k, c2w) in enumerate(cams):
        os.makedirs(os.path.join(img_root, "rgbs", cid), exist_ok=True)
        os.makedirs(os.path.join(img_root, "masks", cid), exist_ok=True)
        cam = Camera.from_kw2c(cid, args.width, args.height, k,
                               np.linalg.inv(c2w), near=1, far=10)
        for t in range(n_frames):
            v = avatar.select_verts(teacher, t)
            img, out = render_avatar_frame(
                avatar, teacher, v, jnp.asarray(avatar.ao_maps[t]), cam,
                ci, active_sh_degree=3, bg=bg, white_bkgd=False,
                tile_capacity=512, work_cap=8192)
            assert int(out["work_overflow"]) == 0, "teacher render overflow"
            im8 = np.asarray(jnp.clip(img, 0, 1) * 255).astype(np.uint8)
            im8 = im8.transpose(1, 2, 0) if im8.shape[0] == 3 else im8
            Image.fromarray(im8).save(
                os.path.join(img_root, "rgbs", cid,
                             f"{cid}_rgb{t:06d}.jpg"), quality=95)
            msk = (np.asarray(out["alpha"])[0] > 0.5).astype(np.uint8)
            Image.fromarray(msk * 255).save(
                os.path.join(img_root, "masks", cid,
                             f"{cid}_mask{t:06d}.png"))
        print(f"{cid}: {n_frames} frames rendered", flush=True)
    print(json.dumps({"out": args.out, "n_faces": len(faces),
                      "n_cams": args.n_cams, "n_frames": n_frames,
                      "wh": [args.width, args.height]}))


if __name__ == "__main__":
    main()
