"""Rendering: differentiable 3DGS splatting + SH shading + quasi-shadow.

High-level ``render()`` mirrors the reference renderer entry point
(/root/reference/gaussian_renderer/__init__.py:18-111) including the
``override_color`` and ``extra``-gaussians paths used by the demo."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from . import gaussians as G
from .cameras import Camera, spherical_camera_path  # noqa: F401
from .geometry import compute_face_orientation  # noqa: F401
from .rasterizer import CameraArrays, camera_arrays, rasterize
from .sh import eval_sh, rgb2sh, sh2rgb  # noqa: F401
from .shadow import (grid_sample_bilinear, init_shadow_unet,  # noqa: F401
                     shadow_unet_apply)


def convert_sh_colors(features, positions, cam_center, active_sh_degree):
    """SH -> clamped RGB toward the camera (train_material_params.py:43-59).

    features: (N, (deg+1)^2, 3)."""
    dirs = positions - cam_center[None, :]
    dirs = dirs / jnp.maximum(
        jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
    shs = jnp.swapaxes(features, 1, 2)  # (N, 3, coeffs)
    rgb = eval_sh(active_sh_degree, shs, dirs)
    return jnp.clip(rgb + 0.5, 0.0, None)


def render(cam: Camera, params: G.GaussianParams,
           frames: Optional[G.FaceFrames], bg_color,
           active_sh_degree: int = 0, scaling_modifier: float = 1.0,
           override_color=None, extra=None, means2d_offset=None,
           tile_capacity: int = 512, tile_capacity_lo: int = 0,
           hot_tiles: int = 0):
    """gaussian_renderer/__init__.py:18-111 equivalent.

    ``extra`` = (xyz, colors, opacity, scales_log?, cov3d) tuple of
    world-space gaussians appended at render time (demo props/sand);
    here extra covariances are passed precomputed.
    Returns dict(render, alpha/mask, radii, depth).
    """
    ca = camera_arrays(cam)
    xyz = G.get_xyz(params, frames)
    opacity = G.get_opacity(params)[:, 0] * params.alive
    cov3d = G.get_covariance(params, frames, scaling_modifier)

    if override_color is None:
        colors = convert_sh_colors(G.get_features(params), xyz,
                                   ca.cam_center, active_sh_degree)
    else:
        colors = override_color

    if extra is not None:
        extra_xyz, extra_colors, extra_opacity, extra_cov3d = extra
        xyz = jnp.concatenate([xyz, extra_xyz], 0)
        colors = jnp.concatenate([colors, extra_colors], 0)
        opacity = jnp.concatenate([opacity, extra_opacity.reshape(-1)], 0)
        cov3d = jnp.concatenate([cov3d, extra_cov3d], 0)
        if means2d_offset is not None:
            means2d_offset = jnp.concatenate(
                [means2d_offset,
                 jnp.zeros((extra_xyz.shape[0], 2), xyz.dtype)], 0)

    out = rasterize(xyz, colors, opacity, cov3d, ca,
                    jnp.asarray(bg_color, jnp.float32),
                    width=cam.image_width, height=cam.image_height,
                    means2d_offset=means2d_offset,
                    tile_capacity=tile_capacity,
                    tile_capacity_lo=tile_capacity_lo,
                    hot_tiles=hot_tiles)
    out["mask"] = out["alpha"]
    return out
