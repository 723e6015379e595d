"""UV-space ambient-occlusion baking on TPU.

Replaces the reference's headless Blender Cycles bake subprocess
(/root/reference/blender/bake.py:22-80, invoked in-loop at
train_material_params.py:825-826): per-frame 256^2 UV AO maps for the
quasi-shadow network.  Approximation: cosine-hemisphere ray sampling with
occlusion tested against a voxelized occupancy grid of the posed mesh —
fully jit-able and differentiable w.r.t. vertex positions (soft
occupancy), so AO can even sit inside a training loss.

The UV chart rasterization (texel -> face + barycentric) is a host-side
one-time precomputation from the UV template mesh.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class UVChart:
    """Texel -> surface mapping for one UV layout (static)."""
    face_idx: np.ndarray    # (T,) face per covered texel
    bary: np.ndarray        # (T, 3)
    texel_ij: np.ndarray    # (T, 2) row, col
    resolution: int


def rasterize_uv_chart(uv_verts: np.ndarray, uv_faces: np.ndarray,
                       resolution: int = 256) -> UVChart:
    """Fill UV triangles into a texel table (host, once).

    uv_verts (Nuv, 2) in [0, 1]; uv_faces (F, 3) indices into uv_verts
    (per-corner UV topology like OBJ f v/vt records)."""
    face_idx, bary, texel = [], [], []
    res = resolution
    for fi, tri in enumerate(uv_faces):
        p = uv_verts[tri]  # (3, 2) in [0,1]
        # texel centers covered by the triangle bbox
        lo = np.clip(np.floor(p.min(0) * res).astype(int), 0, res - 1)
        hi = np.clip(np.ceil(p.max(0) * res).astype(int), 0, res)
        if np.any(hi <= lo):
            continue
        us, vs = np.meshgrid(np.arange(lo[0], hi[0]),
                             np.arange(lo[1], hi[1]), indexing="ij")
        pts = np.stack([(us.ravel() + 0.5) / res,
                        (vs.ravel() + 0.5) / res], -1)
        d = p[1:] - p[0]
        det = d[0, 0] * d[1, 1] - d[0, 1] * d[1, 0]
        if abs(det) < 1e-12:
            continue
        rel = pts - p[0]
        b1 = (rel[:, 0] * d[1, 1] - rel[:, 1] * d[1, 0]) / det
        b2 = (-rel[:, 0] * d[0, 1] + rel[:, 1] * d[0, 0]) / det
        inside = (b1 >= -1e-4) & (b2 >= -1e-4) & (b1 + b2 <= 1 + 1e-4)
        if not inside.any():
            continue
        b1, b2 = b1[inside], b2[inside]
        face_idx.append(np.full(inside.sum(), fi))
        bary.append(np.stack([1 - b1 - b2, b1, b2], -1))
        # image row = v flipped (texture convention), col = u
        texel.append(np.stack([res - 1 - pts[inside][:, 1] * res,
                               pts[inside][:, 0] * res], -1).astype(int))
    if not face_idx:
        raise ValueError("UV chart covers no texels")
    return UVChart(face_idx=np.concatenate(face_idx),
                   bary=np.concatenate(bary).astype(np.float32),
                   texel_ij=np.clip(np.concatenate(texel), 0, res - 1),
                   resolution=resolution)


def load_uv_chart(uv_path: str, resolution: int = 256) -> UVChart:
    """UV chart straight from an OBJ's vt/f records (host, once)."""
    vt, fuv = [], []
    with open(uv_path) as f:
        for line in f:
            if line[:2] == "vt":
                vt.append([float(x) for x in line[2:].split()])
            elif line[:2] == "f ":
                fuv.append([int(p.split("/")[1]) - 1
                            for p in line[2:].split()])
    return rasterize_uv_chart(np.asarray(vt, np.float32),
                              np.asarray(fuv), resolution=resolution)


def _fibonacci_hemisphere(n: int) -> np.ndarray:
    """Cosine-ish hemisphere directions around +z."""
    i = np.arange(n) + 0.5
    phi = np.pi * (1 + 5 ** 0.5) * i
    cos_t = np.sqrt(1.0 - i / n)      # cosine-weighted in z
    sin_t = np.sqrt(1.0 - cos_t ** 2)
    return np.stack([np.cos(phi) * sin_t, np.sin(phi) * sin_t,
                     cos_t], -1).astype(np.float32)


@partial(jax.jit, static_argnames=("resolution", "grid_res", "n_rays",
                                   "n_steps"))
def bake_ao(verts, faces, chart_face_idx, chart_bary, chart_texel,
            resolution: int = 256, grid_res: int = 96, n_rays: int = 32,
            n_steps: int = 48, max_dist: float = 0.5,
            occupancy_sigma: float = 1.5, extinction: float = 2.0):
    """Bake a (1, res, res) AO map for the posed mesh.

    Occlusion = soft occupancy (surface-sample density splatted to a
    voxel grid, squashed) integrated along hemisphere rays."""
    verts = jnp.asarray(verts)
    faces = jnp.asarray(faces)

    # --- voxel occupancy from face-centroid + vertex splats ------------
    lo = verts.min(0) - 0.05
    hi = verts.max(0) + 0.05
    scale = (grid_res - 1) / jnp.maximum(hi - lo, 1e-6)
    tri = verts[faces]
    # dense fixed barycentric sampling so triangles larger than a voxel
    # still register contiguous occupancy
    bary_set = jnp.asarray(
        [[1/3, 1/3, 1/3], [0.6, 0.2, 0.2], [0.2, 0.6, 0.2],
         [0.2, 0.2, 0.6], [0.5, 0.5, 0.0], [0.0, 0.5, 0.5],
         [0.5, 0.0, 0.5], [0.8, 0.1, 0.1], [0.1, 0.8, 0.1],
         [0.1, 0.1, 0.8]], jnp.float32)
    face_samples = jnp.einsum("sc,fcd->fsd", bary_set, tri).reshape(-1, 3)
    samples = jnp.concatenate([verts, face_samples], 0)
    cell = jnp.clip(((samples - lo) * scale), 0, grid_res - 1 - 1e-4)
    ci = cell.astype(jnp.int32)
    flat = (ci[:, 0] * grid_res + ci[:, 1]) * grid_res + ci[:, 2]
    occ = jnp.zeros((grid_res ** 3,)).at[flat].add(1.0, mode="drop")
    occ = 1.0 - jnp.exp(-occupancy_sigma * occ)
    occ3 = occ.reshape(grid_res, grid_res, grid_res)

    def sample_occ(p):
        """Trilinear occupancy at world points p (..., 3)."""
        g = jnp.clip((p - lo) * scale, 0.0, grid_res - 1.001)
        g0 = jnp.floor(g).astype(jnp.int32)
        f = g - g0
        out = 0.0
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    w = (jnp.where(dx, f[..., 0], 1 - f[..., 0])
                         * jnp.where(dy, f[..., 1], 1 - f[..., 1])
                         * jnp.where(dz, f[..., 2], 1 - f[..., 2]))
                    out = out + w * occ3[g0[..., 0] + dx, g0[..., 1] + dy,
                                         g0[..., 2] + dz]
        return out

    # --- surface points + normals per covered texel ---------------------
    tri_t = verts[faces[chart_face_idx]]                   # (T, 3, 3)
    pts = jnp.einsum("tc,tcd->td", chart_bary, tri_t)      # (T, 3)
    n = jnp.cross(tri_t[:, 1] - tri_t[:, 0], tri_t[:, 2] - tri_t[:, 0])
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)

    # tangent frame
    helper = jnp.where(jnp.abs(n[:, :1]) < 0.9,
                       jnp.asarray([1.0, 0.0, 0.0])[None],
                       jnp.asarray([0.0, 1.0, 0.0])[None])
    t1 = jnp.cross(n, jnp.broadcast_to(helper, n.shape))
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True),
                          1e-12)
    t2 = jnp.cross(n, t1)
    dirs_local = jnp.asarray(_fibonacci_hemisphere(n_rays))   # (R, 3)
    dirs = (dirs_local[None, :, 0:1] * t1[:, None]
            + dirs_local[None, :, 1:2] * t2[:, None]
            + dirs_local[None, :, 2:3] * n[:, None])          # (T, R, 3)

    # --- march: transmittance exp(-∫ k·occ dl) along the ray -------------
    # Step-length-weighted optical depth instead of per-sample
    # independent attenuation: thin voxel shells straddled between
    # samples still integrate their density, so occlusion no longer
    # depends on whether a step center lands inside the shell.
    # Validated against the closed-form sphere-over-plane AO
    # (1 - (r/d)^2 cosθ): mean |err| 0.020 / max 0.13 at production
    # 256^2, 32 rays (vs 0.038 / 0.22 for the old prod(1-0.6·occ));
    # see tests/test_preprocess_ao.py::test_ao_analytic_bound.
    eps = 2.0 / scale.max()
    ts = jnp.linspace(0.0, 1.0, n_steps + 1)[1:] ** 1.5 * max_dist
    ray_pts = pts[:, None, None, :] + dirs[:, :, None, :] * \
        ts[None, None, :, None] + n[:, None, None, :] * eps
    occ_along = sample_occ(ray_pts)                           # (T, R, S)
    voxel = 1.0 / scale.max()
    dls = jnp.diff(jnp.concatenate([jnp.zeros((1,)), ts]))
    # ``extinction`` scales the optical depth so ONE crossing of a thin
    # (1-voxel) surface shell attenuates strongly, approaching the
    # binary visibility of a ray-traced bake: k=2 transmits e^-2 = 14%
    # per full-occupancy shell instead of e^-1 = 37%.  k=2 + 48 steps is
    # the bias-zero point against the exact ray-traced garment-patch
    # oracle (tests/test_preprocess_ao.py::test_ao_garment_oracle:
    # mean |err| 0.197 -> 0.107, under-flap 0.74 -> 0.29 vs oracle 0.23)
    # and does not regress the closed-form sphere-plane bound (0.0215).
    tau = jnp.sum(occ_along * dls[None, None, :], axis=-1) / voxel
    vis = jnp.exp(-extinction * tau)
    ao = jnp.mean(vis, axis=-1)                               # (T,)

    img = jnp.ones((resolution, resolution))
    img = img.at[chart_texel[:, 0], chart_texel[:, 1]].set(ao, mode="drop")
    return img[None]
