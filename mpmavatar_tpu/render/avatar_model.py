"""Mesh-bound Gaussian avatar: tracked mesh sequence + splats + shadow.

Port of ``MeshGaussianModel`` (/root/reference/scene/
mesh_gaussian_model.py:24-245): loads the tracking stage's ``params_*.npz``
+ AO maps + UV template, owns per-frame vertex offsets, per-camera color
calibration and the quasi-shadow UNet, and exposes mesh posing +
regularizer losses.  All learnables live in a single pytree
(``AvatarParams``) so one optax optimizer trains everything.
"""

from __future__ import annotations

import dataclasses
import os
from glob import glob
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import pytree_dataclass
from ..core.linalg import safe_norm
from . import gaussians as G
from .geometry import find_adjacent_faces
from .shadow import init_shadow_unet


@pytree_dataclass
class AvatarParams:
    """All learnables of the appearance stage
    (mesh_gaussian_model.py:76-120, 148-170)."""
    splats: G.GaussianParams
    verts_offset: jnp.ndarray   # (T, V, 3)
    cam_m: jnp.ndarray          # (n_cams, 3) log color gain
    cam_c: jnp.ndarray          # (n_cams, 3) color bias
    shadow: dict                # shadow UNet params


@dataclasses.dataclass
class MeshAvatar:
    """Static (non-learned) avatar assets."""
    faces: np.ndarray           # (F, 3)
    verts_orig: np.ndarray      # (T, V, 3)
    ao_maps: np.ndarray         # (T, 1, H, W)
    uv_coord: np.ndarray        # (F, 2) in [-1, 1] (y flipped)
    face_neighbors: np.ndarray  # (F, 3)
    neighbor_weight: np.ndarray  # (F, 3)
    neighbor_dist: np.ndarray   # (F, 3)
    num_timesteps: int
    sh_degree: int

    def select_verts(self, params: AvatarParams, timestep: int,
                     add_offset=True):
        """mesh_gaussian_model.py:122-135."""
        v = jnp.asarray(self.verts_orig[timestep])
        if add_offset:
            v = v + params.verts_offset[timestep]
        return v

    def frames_for_verts(self, verts):
        """mesh posing -> face frames (set_mesh_by_verts, :137-148)."""
        return G.face_frames_from_verts(verts, jnp.asarray(self.faces))

    # ---- regularizers (mesh_gaussian_model.py:203-245) ---------------
    def normal_loss(self, verts):
        vf = verts[jnp.asarray(self.faces)]
        d3 = jnp.cross(vf[:, 1] - vf[:, 0], vf[:, 2] - vf[:, 0])
        n = d3 / jnp.maximum(safe_norm(d3, axis=1, keepdims=True), 1e-12)
        nn = n[jnp.asarray(self.face_neighbors)]
        dot = jnp.sum(n[:, None] * nn, -1).mean(-1)
        return jnp.mean(jnp.abs(dot - 1.0))

    def opacity_loss(self, params: AvatarParams):
        alive = params.splats.alive
        op = G.get_opacity(params.splats)[:, 0]
        return jnp.sum((1.0 - op) * alive) / jnp.maximum(jnp.sum(alive), 1)

    def iso_loss(self, verts):
        """mesh_gaussian_model.py:226-232 — with one robustness deviation:
        boundary faces get THEMSELVES as padding neighbors (reference
        find_adjacent_faces, general_utils.py:308-312), whose offset is
        analytically zero.  Torch evaluates that zero exactly, but under
        XLA fusion ``xyz`` and ``xyz[neighbors]`` may round differently
        by 1 ulp and the d(mag)/d(off) = off/mag ~ 1e10 factor amplifies
        the ulp into multi-order-of-magnitude gradient noise (observed:
        jit vs eager grads differing 900x).  Self rows are masked out of
        the loss; their reference contribution is sqrt(1e-20) = 1e-10
        per row, i.e. unchanged to float precision."""
        faces_j = jnp.asarray(self.face_neighbors)
        self_mask = jnp.asarray(
            self.face_neighbors
            == np.arange(len(self.faces))[:, None])
        xyz = verts[jnp.asarray(self.faces)].mean(1)
        npts = xyz[faces_j]
        off = npts - xyz[:, None]
        mag = jnp.sqrt(jnp.sum(off ** 2, -1) + 1e-20)
        diff = (mag - jnp.asarray(self.neighbor_dist)) ** 2
        val = jnp.where(self_mask, 0.0,
                        diff * jnp.asarray(self.neighbor_weight))
        return jnp.mean(jnp.sqrt(val + 1e-20))

    def area_loss(self, verts):
        vf = verts[jnp.asarray(self.faces)]
        area = 0.5 * safe_norm(jnp.cross(vf[:, 1] - vf[:, 0],
                                         vf[:, 2] - vf[:, 0]), axis=1)
        return jnp.mean(jnp.abs(area - jnp.mean(area)))


def load_uv_coords(uv_path: str, num_faces: Optional[int] = None):
    """Per-face UV centroids in grid_sample coordinates
    (mesh_gaussian_model.py:106-111)."""
    vt, fuv = [], []
    with open(uv_path) as f:
        for line in f:
            if line[:2] == "vt":
                vt.append([float(x) for x in line[2:].split()])
            elif line[:2] == "f ":
                fuv.append([int(p.split("/")[1]) - 1
                            for p in line[2:].split()])
    uv = np.asarray(vt, np.float32)[np.asarray(fuv)].mean(1) * 2.0 - 1.0
    uv[:, 1] *= -1
    return uv


def load_mesh_avatar(trained_model_path: str, uv_path: str,
                     sh_degree: int = 3, capacity_factor: float = 4.0,
                     shadow_seed: int = 0):
    """init_from_trained_model (mesh_gaussian_model.py:30-120).

    Returns (MeshAvatar, AvatarParams)."""
    from PIL import Image

    sort_key = lambda p: int(p[:-4].split("_")[-1])
    params_files = sorted(glob(os.path.join(trained_model_path,
                                            "params_*.npz")), key=sort_key)
    assert params_files, f"no params_*.npz under {trained_model_path}"

    verts_orig, rgb_list, ao_maps = [], [], []
    faces = cam_m = cam_c = None
    for idx, pf in enumerate(params_files):
        data = dict(np.load(pf))
        ao_file = pf.replace("params_", "aomap/mesh_cloth_").replace(
            ".npz", ".png")
        ao = np.array(Image.open(ao_file).convert("L"),
                      np.float32) / 255.0
        if idx == 0:
            cam_m = data["cam_m"].astype(np.float32)
            cam_c = data["cam_c"].astype(np.float32)
            faces = data["faces"].astype(np.int32)
        rgb_list.append(np.clip(data["rgb_colors"], 0, 1))
        verts_orig.append(data["vertices"].astype(np.float32))
        ao_maps.append(ao)

    verts_orig = np.stack(verts_orig)
    ao_maps = np.stack(ao_maps)[:, None]
    num_faces = len(faces)
    rgb = np.mean(np.stack(rgb_list), axis=0).astype(np.float32)

    face_neighbors = find_adjacent_faces(faces)
    centers = verts_orig[0][faces].mean(1)
    nb = centers[face_neighbors]
    sq = np.sum((nb - centers[:, None]) ** 2, -1)

    avatar = MeshAvatar(
        faces=faces, verts_orig=verts_orig, ao_maps=ao_maps,
        uv_coord=load_uv_coords(uv_path, num_faces),
        face_neighbors=face_neighbors,
        neighbor_weight=np.exp(-2000 * sq).astype(np.float32),
        neighbor_dist=np.sqrt(sq).astype(np.float32),
        num_timesteps=len(params_files), sh_degree=sh_degree)

    splats = G.init_from_mesh(num_faces, sh_degree, rgb=rgb,
                              capacity=int(num_faces * capacity_factor))
    shadow = init_shadow_unet(jax.random.PRNGKey(shadow_seed),
                              ao_maps.mean(axis=0), uv_size=256,
                              shadow_size=256, n_dims=4)
    params = AvatarParams(
        splats=splats,
        verts_offset=jnp.zeros_like(jnp.asarray(verts_orig)),
        cam_m=jnp.asarray(cam_m), cam_c=jnp.asarray(cam_c),
        shadow=shadow)
    return avatar, params


def save_avatar_checkpoint(path: str, params: AvatarParams, avatar:
                           MeshAvatar):
    """mesh_gaussian_model.py:172-187: ply + offsets + cams + shadow."""
    from ..utils.io import write_ply_gaussians
    os.makedirs(path, exist_ok=True)
    s = params.splats
    alive = np.asarray(s.alive)
    write_ply_gaussians(
        os.path.join(path, "point_cloud.ply"),
        np.asarray(s.xyz)[alive], np.asarray(s.features_dc)[alive],
        np.asarray(s.features_rest)[alive], np.asarray(s.opacity)[alive],
        np.asarray(s.scaling)[alive], np.asarray(s.rotation)[alive],
        binding=np.asarray(s.binding)[alive])
    np.save(os.path.join(path, "verts_offset.npy"),
            np.asarray(params.verts_offset))
    np.savez(os.path.join(path, "cams.npz"),
             cam_m=np.asarray(params.cam_m), cam_c=np.asarray(params.cam_c))
    np.savez(os.path.join(path, "shadow_net.npz"),
             **{k: np.asarray(v) for k, v in params.shadow.items()})


def load_avatar_checkpoint(path: str, params: AvatarParams) -> AvatarParams:
    """mesh_gaussian_model.py:189-201 equivalent."""
    from ..utils.io import read_ply_gaussians
    ply = read_ply_gaussians(os.path.join(path, "point_cloud.ply"))
    n = len(ply["xyz"])
    cap = params.splats.capacity
    s = params.splats

    def put(arr, new):
        new = jnp.asarray(new.reshape((n,) + arr.shape[1:]))
        return arr.at[:n].set(new)

    splats = G.GaussianParams(
        xyz=put(s.xyz, ply["xyz"]),
        features_dc=put(s.features_dc, ply["features_dc"]),
        features_rest=put(s.features_rest, ply["features_rest"]),
        scaling=put(s.scaling, ply["scaling"]),
        rotation=put(s.rotation, ply["rotation"]),
        opacity=put(s.opacity, ply["opacity"].reshape(-1, 1)),
        binding=s.binding.at[:n].set(jnp.asarray(ply["binding"])),
        alive=jnp.arange(cap) < n)
    cams = np.load(os.path.join(path, "cams.npz"))
    shadow_raw = np.load(os.path.join(path, "shadow_net.npz"))
    shadow = {k: jnp.asarray(v) for k, v in shadow_raw.items()}
    return AvatarParams(splats=splats,
                        verts_offset=jnp.asarray(
                            np.load(os.path.join(path, "verts_offset.npy"))),
                        cam_m=jnp.asarray(cams["cam_m"]),
                        cam_c=jnp.asarray(cams["cam_c"]),
                        shadow=shadow)
