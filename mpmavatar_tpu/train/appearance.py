"""Stage-2 appearance training (3DGS + shadow + color calibration).

Port of /root/reference/train_appearance.py:49-266 as a jitted optax train
step: per iteration sample a (camera, frame), pose the mesh, run the
shadow UNet, shade SH colors, splat, and optimize
L1 + DSSIM (+ regularizers) with per-group learning rates.  LPIPS is
omitted in-loop (its pretrained VGG weights are an external artifact; the
hook is provided via ``extra_loss_fn``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..render import (camera_arrays, convert_sh_colors, grid_sample_bilinear,
                      rasterize, shadow_unet_apply)
from ..render import gaussians as G
from ..render.avatar_model import AvatarParams, MeshAvatar
from ..utils.losses import l1_loss, ssim


def make_optimizer(opt, spatial_lr_scale: float):
    """Per-group LRs (gaussian_model.py:218-231,
    mesh_gaussian_model.py:150-163)."""
    def label_fn(params):
        return AvatarParams(
            splats=G.GaussianParams(
                xyz="xyz", features_dc="f_dc", features_rest="f_rest",
                scaling="scaling", rotation="rotation", opacity="opacity",
                binding="frozen", alive="frozen"),
            verts_offset="verts", cam_m="cams", cam_c="cams",
            shadow={k: ("frozen" if k in ("ao_mean", "beta")
                        else "shadow") for k in params.shadow})

    tx = optax.multi_transform(
        {
            "xyz": optax.adam(opt.position_lr_init * spatial_lr_scale,
                              eps=1e-15),
            "f_dc": optax.adam(opt.feature_lr, eps=1e-15),
            "f_rest": optax.adam(0.0, eps=1e-15),
            "opacity": optax.adam(opt.opacity_lr, eps=1e-15),
            "scaling": optax.adam(opt.scaling_lr, eps=1e-15),
            "rotation": optax.adam(opt.rotation_lr, eps=1e-15),
            "verts": optax.adam(opt.verts_lr_init * spatial_lr_scale,
                                eps=1e-15),
            "cams": optax.adam(1e-4, eps=1e-15),
            "shadow": optax.adam(1e-4, eps=1e-15),
            "frozen": optax.set_to_zero(),
        },
        label_fn)
    return tx


def shaded_colors(avatar: MeshAvatar, params: AvatarParams, frames,
                  ao_map, cam_center, xyz, active_sh_degree: int):
    """ShadowUNet(AO) -> per-face shadow -> shadow * SH color
    (train_appearance.py:118-123)."""
    shadow_map = shadow_unet_apply(params.shadow, ao_map[None])["shadow_map"]
    shadow = grid_sample_bilinear(shadow_map[0],
                                  jnp.asarray(avatar.uv_coord))  # (F, 1)
    shadow_per_gauss = shadow[params.splats.binding]
    colors = convert_sh_colors(G.get_features(params.splats), xyz,
                               cam_center, active_sh_degree)
    return shadow_per_gauss * colors, shadow_map


def render_avatar_frame(avatar: MeshAvatar, params: AvatarParams,
                        verts, ao_map, cam, camera_idx,
                        active_sh_degree: int, bg, white_bkgd: bool,
                        means2d_offset=None, tile_capacity: int = 512,
                        work_cap: int = 0, chunk: int = 32):
    """Pose + shade + splat + color-calibrate one frame
    (train_appearance.py:116-127, train_material_params.py:857-868).

    ``cam`` may be a host Camera or a (CameraArrays, width, height)
    triple (jit-friendly)."""
    frames = avatar.frames_for_verts(verts)
    if isinstance(cam, tuple):
        ca, width, height = cam
    else:
        ca, width, height = camera_arrays(cam), cam.image_width, \
            cam.image_height
    xyz = G.get_xyz(params.splats, frames)
    colors, _ = shaded_colors(avatar, params, frames, ao_map, ca.cam_center,
                              xyz, active_sh_degree)
    opacity = G.get_opacity(params.splats)[:, 0] * params.splats.alive
    cov3d = G.get_covariance(params.splats, frames)
    out = rasterize(xyz, colors, opacity, cov3d, ca, jnp.asarray(bg),
                    width=width, height=height,
                    means2d_offset=means2d_offset,
                    tile_capacity=tile_capacity, work_cap=work_cap,
                    chunk=chunk)
    rendering = out["render"] * jnp.exp(params.cam_m[camera_idx])[:, None, None] \
        + params.cam_c[camera_idx][:, None, None]
    rendering = rendering * out["alpha"]
    if white_bkgd:
        rendering = rendering + (1.0 - out["alpha"])
    return rendering, out


@dataclasses.dataclass
class AppearanceLossWeights:
    """train_appearance.py:87,132-152 (loss_weights dict; the reg set
    actually used is normal/opacity/iso/eq_faces_weight(area)/xyz/scale;
    the offset term is commented out in the reference)."""
    dssim: float = 0.2
    lpips: float = 0.2
    normal: float = 0.1
    opacity: float = 0.05
    iso: float = 20.0
    area: float = 1000.0
    xyz: float = 1.0
    scale: float = 1.0
    offset: float = 0.0
    threshold_xyz: float = 1.0
    threshold_scale: float = 0.6


def _masked_mean(values, mask):
    return jnp.sum(values * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def frame_loss(avatar: MeshAvatar, weights: AppearanceLossWeights,
               p: AvatarParams, m2d, verts, offset_rows, ao_map, ca,
               width: int, height: int, camera_idx, gt_rgb, gt_msk,
               active_sh_degree: int, bg, white_bkgd: bool,
               tile_capacity: int, work_cap: int, chunk: int, lpips_fn):
    """The full stage-2 loss for ONE (camera, frame) sample
    (train_appearance.py:116-152): render + L1/DSSIM (+LPIPS) + the
    regularizer set (normal/opacity/iso/area/xyz/scale/offset).

    Shared verbatim by the single-device train step and the
    data-parallel step (parallel.appearance_dp) so multi-chip training
    optimizes the same objective.  ``verts`` must already carry the
    learnable offset (gradients flow through it); ``offset_rows`` is the
    frame's slice of ``verts_offset`` for the optional offset reg."""
    rendering, out = render_avatar_frame(
        avatar, p, verts, ao_map, (ca, width, height), camera_idx,
        active_sh_degree, bg, white_bkgd, means2d_offset=m2d,
        tile_capacity=tile_capacity, work_cap=work_cap, chunk=chunk)
    rendering = jnp.clip(rendering, 0.0, 1.0)
    gt = gt_rgb * gt_msk + (1.0 - gt_msk if white_bkgd else 0.0)
    ll1 = l1_loss(rendering, gt)
    ds = 1.0 - ssim(rendering, gt)
    loss = (1.0 - weights.dssim) * ll1 + weights.dssim * ds
    # nan (not 0.0) when disabled: a log line reading "lpips 0.00000"
    # would suggest the term is active and converged
    lp = jnp.full((), jnp.nan)
    if lpips_fn is not None:
        lp = lpips_fn(rendering[None], gt[None])
        loss = loss + weights.lpips * lp
    loss = loss + weights.normal * avatar.normal_loss(verts)
    loss = loss + weights.opacity * avatar.opacity_loss(p)
    loss = loss + weights.iso * avatar.iso_loss(verts)
    loss = loss + weights.area * avatar.area_loss(verts)
    # xyz / scale threshold regs over visible gaussians
    # (train_appearance.py:147-148)
    visible = (out["radii"] > 0) & p.splats.alive

    # safe norms: ||.|| has a NaN gradient at exactly zero (the xyz
    # offsets start at 0), so add eps inside the sqrt
    def _norm(v):
        return jnp.sqrt(jnp.sum(v * v, axis=1) + 1e-12)

    xyz_excess = jax.nn.relu(_norm(p.splats.xyz) - weights.threshold_xyz)
    loss = loss + weights.xyz * _masked_mean(xyz_excess, visible)
    scale_excess = _norm(jax.nn.relu(
        jnp.exp(p.splats.scaling) - weights.threshold_scale))
    loss = loss + weights.scale * _masked_mean(scale_excess, visible)
    if weights.offset:
        loss = loss + weights.offset * jnp.mean(jnp.abs(offset_rows))
    aux = {"l1": ll1, "dssim": ds, "lpips": lp,
           "radii": out["radii"], "alpha": out["alpha"],
           "visible": visible,
           "big_overflow": out["big_overflow"],
           "work_overflow": out["work_overflow"]}
    return loss, aux


def float_leaf_grads(params, loss_of_params_and_m2d, m2d0):
    """value_and_grad over only the FLOAT leaves of ``params`` (+ the
    viewspace offset), zeros for integer bookkeeping leaves.

    Returns ((loss, aux), grads_pytree, vgrad)."""
    flat, treedef = jax.tree.flatten(params)
    fmask = [jnp.issubdtype(l.dtype, jnp.floating) for l in flat]

    def recombine(floats):
        it = iter(floats)
        return jax.tree.unflatten(
            treedef, [next(it) if m else orig
                      for m, orig in zip(fmask, flat)])

    floats_in = [l for l, m in zip(flat, fmask) if m]
    (loss, aux), (fgrads, vgrad) = jax.value_and_grad(
        lambda fl, m2d: loss_of_params_and_m2d(recombine(fl), m2d),
        argnums=(0, 1), has_aux=True)(floats_in, m2d0)
    it = iter(fgrads)
    grads = jax.tree.unflatten(
        treedef, [next(it) if m else jnp.zeros_like(orig)
                  for m, orig in zip(fmask, flat)])
    return (loss, aux), grads, vgrad


def apply_updates_float(tx, params, grads, opt_state):
    """optax update applied to float leaves only (integer leaves pass
    through unchanged)."""
    updates, opt_state = tx.update(grads, opt_state, params)
    params = jax.tree.map(
        lambda p, u: p + u if jnp.issubdtype(p.dtype, jnp.floating)
        else p, params, updates)
    return params, opt_state


def make_train_step(avatar: MeshAvatar, opt, tx, active_sh_degree: int,
                    white_bkgd: bool,
                    weights: Optional[AppearanceLossWeights] = None,
                    tile_capacity: int = 512, lpips_fn=None,
                    work_cap: int = 0, chunk: int = 32):
    """One jitted optimization step.

    The returned aux carries ``vgrad``: d(loss)/d(means2d) extracted from
    the SAME backward pass as the parameter gradients (the reference's
    viewspace_points grad, gaussian_renderer/__init__.py:26-29) — no
    second render.  It is scaled to NDC units (x 0.5*W, 0.5*H) so the
    reference's ``densify_grad_threshold`` applies unchanged (the CUDA
    backward folds ddelx_dx = 0.5*W into dL/dmean2D).

    ``lpips_fn`` (optional, from utils.lpips_jax.make_lpips_fn) adds the
    reference's lambda_lpips * LPIPS(image, gt) term
    (train_appearance.py:133-134).
    """
    weights = weights or AppearanceLossWeights(
        dssim=opt.lambda_dssim, lpips=getattr(opt, "lambda_lpips", 0.2),
        threshold_xyz=getattr(opt, "threshold_xyz", 1.0),
        threshold_scale=getattr(opt, "threshold_scale", 0.6))
    bg = jnp.ones(3) if white_bkgd else jnp.zeros(3)

    @partial(jax.jit, static_argnames=("timestep", "width", "height"))
    def train_step(params: AvatarParams, opt_state, timestep: int,
                   camera_idx, ca, gt_rgb, gt_msk, ao_map,
                   width: int, height: int):
        def loss_fn(p, m2d):
            verts = avatar.select_verts(p, timestep)
            return frame_loss(
                avatar, weights, p, m2d, verts, p.verts_offset[timestep],
                ao_map, ca, width, height, camera_idx, gt_rgb, gt_msk,
                active_sh_degree, bg, white_bkgd, tile_capacity, work_cap,
                chunk, lpips_fn)

        m2d0 = jnp.zeros((params.splats.capacity, 2))
        (loss, aux), grads, vgrad = float_leaf_grads(params, loss_fn, m2d0)
        # pixel-space -> NDC-scale view-space gradient (see docstring)
        aux["vgrad"] = vgrad * jnp.asarray(
            [0.5 * width, 0.5 * height], vgrad.dtype)
        params, opt_state = apply_updates_float(tx, params, grads,
                                                opt_state)
        return params, opt_state, loss, aux

    return train_step


def evaluate_appearance(avatar: MeshAvatar, params: AvatarParams,
                        test_dataset, test_camera_index,
                        active_sh_degree: int, white_bkgd: bool,
                        lpips_fn=None, tile_capacity: int = 512,
                        max_items: Optional[int] = None):
    """Held-out test-set evaluation (train_appearance.py:183-241):
    renders every (test camera, frame) pair and reports mean L1 / PSNR
    (+ LPIPS when weights are available)."""
    from ..utils.losses import psnr

    bg = jnp.ones(3) if white_bkgd else jnp.zeros(3)
    l1s, psnrs, lps = [], [], []
    pairs = [(ci, fi) for ci in range(len(test_dataset.camera_list))
             for fi in range(len(test_dataset.frame_index))]
    if max_items is not None:
        pairs = pairs[:max_items]
    for ci, fi in pairs:
        batch = test_dataset.load_frame(ci, fi)
        cam = batch["cam"]
        t = batch["frame_idx"]
        cam_idx = test_camera_index[batch["camera_idx"]]
        rendering, _ = render_avatar_frame(
            avatar, params, avatar.select_verts(params, t),
            jnp.asarray(avatar.ao_maps[t]),
            (camera_arrays(cam), cam.image_width, cam.image_height),
            cam_idx, active_sh_degree, bg, white_bkgd,
            tile_capacity=tile_capacity)
        rendering = jnp.clip(rendering, 0.0, 1.0)
        gt_rgb = jnp.asarray(batch["rgb"])
        gt_msk = jnp.asarray(batch["msk"])
        gt = gt_rgb * gt_msk + (1.0 - gt_msk if white_bkgd else 0.0)
        l1s.append(float(l1_loss(rendering, gt)))
        psnrs.append(float(psnr(rendering, gt)))
        if lpips_fn is not None:
            lps.append(float(lpips_fn(rendering[None], gt[None])))
    out = {"l1": float(np.mean(l1s)), "psnr": float(np.mean(psnrs))}
    if lps:
        out["lpips"] = float(np.mean(lps))
    return out


def viewspace_gradients(avatar, params, timestep, cam, camera_idx, gt_rgb,
                        gt_msk, ao_map, active_sh_degree, white_bkgd,
                        tile_capacity=512):
    """Standalone view-space gradient probe for densification stats
    (gaussian_renderer/__init__.py:26-29)."""
    bg = jnp.ones(3) if white_bkgd else jnp.zeros(3)

    def loss_fn(m2d):
        verts = avatar.select_verts(params, timestep)
        rendering, _ = render_avatar_frame(
            avatar, params, verts, ao_map, cam, camera_idx,
            active_sh_degree, bg, white_bkgd, means2d_offset=m2d,
            tile_capacity=tile_capacity)
        gt = gt_rgb * gt_msk + (1.0 - gt_msk if white_bkgd else 0.0)
        return l1_loss(rendering, gt)

    m2d = jnp.zeros((params.splats.capacity, 2))
    return jax.grad(loss_fn)(m2d)
