"""Evaluation harness: geometry (CD / F-Score) + appearance (PSNR / SSIM
/ LPIPS-hook) metrics.

Port of /root/reference/eval.py:16-100 and merge_meshes.py:13-44.  The
LPIPS backbone weights are external pretrained artifacts; the hook accepts
any callable ``lpips_fn(img1, img2) -> float`` (see utils.lpips_jax).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np
import jax.numpy as jnp

from ..utils.losses import psnr, ssim
from ..utils.metrics import all_mesh_metrics


def erode(mask: np.ndarray, iterations: int = 5) -> np.ndarray:
    """3x3 binary-ish erosion (cv2.erode equivalent, eval.py:82)."""
    m = mask
    for _ in range(iterations):
        p = np.pad(m, 1, mode="edge")
        m = np.min(np.stack([p[i:i + m.shape[0], j:j + m.shape[1]]
                             for i in range(3) for j in range(3)]), axis=0)
    return m


def gaussian_blur5(mask: np.ndarray) -> np.ndarray:
    """5x5 sigma-auto Gaussian blur (cv2.GaussianBlur((5,5),0),
    eval.py:83)."""
    # cv2 sigma for ksize 5: 0.3*((5-1)*0.5 - 1) + 0.8 = 1.1
    xs = np.arange(5) - 2
    g = np.exp(-(xs ** 2) / (2 * 1.1 ** 2))
    g /= g.sum()
    p = np.pad(mask, 2, mode="edge")
    m = np.apply_along_axis(lambda r: np.convolve(r, g, "valid"), 0, p)
    m = np.apply_along_axis(lambda r: np.convolve(r, g, "valid"), 1, m)
    return m


def eval_mask(mask_gt: np.ndarray) -> np.ndarray:
    """Mask preprocessing for appearance metrics (eval.py:81-84)."""
    return gaussian_blur5(erode(mask_gt, 5))


def appearance_metrics(img_pred: np.ndarray, img_gt: np.ndarray,
                       mask_gt: np.ndarray,
                       lpips_fn: Optional[Callable] = None,
                       suppress_white: bool = False):
    """PSNR/SSIM(/LPIPS) on masked renders (eval.py:58-98).

    img_* are (3, H, W) in [0, 1]; mask_gt (H, W) raw."""
    img_pred = np.array(img_pred, np.float32, copy=True)
    img_gt = np.array(img_gt, np.float32, copy=True)
    if suppress_white:  # ActorsHQ white-background suppression
        wp = img_pred.mean(axis=0) > 0.90
        img_pred[:, wp] = 0
        wg = img_gt.mean(axis=0) > 0.90
        img_gt[:, wg] = 0
    m = eval_mask(mask_gt)[None]
    a = jnp.asarray(img_pred * m)[None]
    b = jnp.asarray(img_gt * m)[None]
    out = {"PSNR": float(psnr(a, b)), "SSIM": float(ssim(a, b))}
    if lpips_fn is not None:
        out["LPIPS"] = float(lpips_fn(a, b))
    return out


def geometry_metrics(pred_verts, pred_faces, gt_verts, gt_faces,
                     sample_count: int = 100000):
    """CD x1000 + F-Score@1e-3 (eval.py:30-56, metric.py:56-63)."""
    fs, cd = all_mesh_metrics(pred_verts, pred_faces, gt_verts, gt_faces,
                              sample_count)
    return {"CD": cd, "F-Score": fs}


def merge_layered_meshes(lower_verts: np.ndarray, upper_verts: np.ndarray,
                         upper_cloth_v_idx: np.ndarray) -> np.ndarray:
    """Layered 4D-DRESS garment merge (merge_meshes.py:13-44): overwrite
    the lower-sim mesh vertices with the upper-sim result at the upper
    garment's vertex indices."""
    out = np.array(lower_verts, copy=True)
    out[upper_cloth_v_idx] = upper_verts[upper_cloth_v_idx]
    return out


def evaluate_sequence(pred_mesh_dir: str, faces, gt_loader,
                      frames, image_pairs=None, lpips_fn=None,
                      suppress_white=False, out_path: Optional[str] = None):
    """Full sequence evaluation driver (eval.py main flow)."""
    from ..utils.io import read_obj
    geo = {"CD": [], "F-Score": []}
    for idx, frame in enumerate(frames):
        pv, _ = read_obj(os.path.join(pred_mesh_dir, f"{idx:03d}.obj"))
        gv, gf = gt_loader(frame)
        m = geometry_metrics(pv, faces, gv, gf)
        geo["CD"].append(m["CD"])
        geo["F-Score"].append(m["F-Score"])

    app = {"PSNR": [], "SSIM": [], "LPIPS": []}
    if image_pairs is not None:
        for img_pred, img_gt, mask in image_pairs:
            m = appearance_metrics(img_pred, img_gt, mask, lpips_fn,
                                   suppress_white)
            for k in app:
                if k in m:
                    app[k].append(m[k])

    results = {k: float(np.mean(v)) for k, v in {**geo, **app}.items() if v}
    if out_path:
        np.savez(os.path.join(out_path, "metric.npz"),
                 **{**{k: np.asarray(v) for k, v in geo.items()},
                    **{k: np.asarray(v) for k, v in app.items() if v}})
    return results


def render_eval_sequence(avatar, params, scene, mesh_dir: str,
                         out_dir: str, uv_path: str,
                         active_sh_degree: int = 3,
                         skip_video: bool = False,
                         ao_resolution: int = 256,
                         tile_capacity: int = 512,
                         max_frames: Optional[int] = None):
    """Stage-4 eval render loop (train_material_params.py:828-881):

    simulated meshes (``mesh_dir/%03d.obj``) -> on-TPU AO bake
    (``out_dir/aomap``; replaces the reference's Blender subprocess,
    train_material_params.py:826) -> per held-out camera renders with
    shadow + SH + color calibration -> ``out_dir/<cam>/{pred,gt}/*.png``
    (+ pred/gt/concat videos when ffmpeg exists).  The written tree is
    exactly what scripts/eval.py consumes."""
    import jax.numpy as jnp
    from PIL import Image

    from ..render.ao import bake_ao, load_uv_chart
    from ..render.rasterizer import camera_arrays
    from ..utils.io import read_obj
    from ..utils.misc import frames_to_video
    from .appearance import render_avatar_frame

    ds = scene.test_dataset
    n_frames = len(ds.frame_index)
    if max_frames is not None:
        n_frames = min(n_frames, max_frames)

    chart = load_uv_chart(uv_path, resolution=ao_resolution)
    cfi = jnp.asarray(chart.face_idx)
    cb = jnp.asarray(chart.bary)
    ct = jnp.asarray(chart.texel_ij)
    faces_j = jnp.asarray(avatar.faces)

    ao_dir = os.path.join(out_dir, "aomap")
    os.makedirs(ao_dir, exist_ok=True)
    all_verts, ao_maps = [], []
    for i in range(n_frames):
        verts, _ = read_obj(os.path.join(mesh_dir, f"{i:03d}.obj"))
        verts = jnp.asarray(verts)
        ao = bake_ao(verts, faces_j, cfi, cb, ct,
                     resolution=ao_resolution)
        all_verts.append(verts)
        ao_maps.append(ao)
        Image.fromarray((np.clip(np.asarray(ao)[0], 0, 1) * 255)
                        .astype(np.uint8)).save(
            os.path.join(ao_dir, f"{i:04d}.png"))

    bg = jnp.ones(3) if scene.white_bkgd else jnp.zeros(3)
    for ci in range(len(ds.camera_list)):
        cam = ds.camera_list[ci]
        camera_idx = scene.test_camera_index[ci]
        savedir = os.path.join(out_dir, str(cam.camera_id))
        preddir = os.path.join(savedir, "pred")
        gtdir = os.path.join(savedir, "gt")
        os.makedirs(preddir, exist_ok=True)
        os.makedirs(gtdir, exist_ok=True)
        ca = camera_arrays(cam)
        for i in range(n_frames):
            rendering, _ = render_avatar_frame(
                avatar, params, all_verts[i], ao_maps[i],
                (ca, cam.image_width, cam.image_height), camera_idx,
                active_sh_degree, bg, scene.white_bkgd,
                tile_capacity=tile_capacity)
            img = (np.clip(np.asarray(rendering).transpose(1, 2, 0),
                           0, 1) * 255).astype(np.uint8)
            frame_no = scene.test_frame_index[i]
            Image.fromarray(img).save(
                os.path.join(preddir, f"{frame_no:04d}.png"))

            batch = ds.load_frame(ci, i)
            gt = batch["rgb"] * batch["msk"]
            if scene.white_bkgd:
                gt = gt + (1.0 - batch["msk"])
            img_gt = (np.clip(gt.transpose(1, 2, 0), 0, 1)
                      * 255).astype(np.uint8)
            Image.fromarray(img_gt).save(
                os.path.join(gtdir, f"{frame_no:04d}.png"))

        if not skip_video:
            start = scene.test_frame_index[0]
            frames_to_video(os.path.join(preddir, "%04d.png"),
                            os.path.join(savedir, "pred.mp4"),
                            start_number=start, num_frames=n_frames)
            frames_to_video(os.path.join(gtdir, "%04d.png"),
                            os.path.join(savedir, "gt.mp4"),
                            start_number=start, num_frames=n_frames)
