"""3D Gaussian parameter store, mesh binding, densify/clone/split/prune.

TPU-native redesign of ``GaussianModel`` / ``MeshGaussianModel``
(/root/reference/scene/gaussian_model.py:26-526,
/root/reference/scene/mesh_gaussian_model.py:24-245).

Key departure from the reference: densification there reallocates arrays
every call; under XLA that would retrigger compilation.  Here the gaussian
set lives in CAPACITY-PADDED arrays with an ``alive`` mask — prune masks
slots off, clone/split write into free slots — so every jitted function
sees static shapes across the whole 30k-iteration appearance run.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import pytree_dataclass
from . import geometry
from .sh import rgb2sh


def inverse_sigmoid(x):
    return jnp.log(x / (1 - x))


@pytree_dataclass
class GaussianParams:
    """Learnable splat parameters, capacity-padded (N = capacity).

    Activations (gaussian_model.py:36-43): scaling = exp(_scaling),
    opacity = sigmoid(_opacity), rotation = normalize(_rotation) [wxyz].
    ``binding`` maps each gaussian to a mesh face (mesh-bound avatar mode);
    local xyz is expressed in the face frame.
    """
    xyz: jnp.ndarray            # (N, 3) local (or world if unbound)
    features_dc: jnp.ndarray    # (N, 1, 3)
    features_rest: jnp.ndarray  # (N, (deg+1)^2-1, 3)
    scaling: jnp.ndarray        # (N, 3) log-scale
    rotation: jnp.ndarray       # (N, 4) wxyz (unnormalized)
    opacity: jnp.ndarray        # (N, 1) logit
    binding: jnp.ndarray        # (N,) int32 face index (-1 = unbound)
    alive: jnp.ndarray          # (N,) bool

    @property
    def capacity(self):
        return self.xyz.shape[0]


def init_from_mesh(num_faces: int, sh_degree: int, rgb: Optional[np.ndarray]
                   = None, capacity: Optional[int] = None) -> GaussianParams:
    """One gaussian per face, identity local frame
    (mesh_gaussian_model.py:61-84)."""
    cap = capacity or num_faces
    n_rest = (sh_degree + 1) ** 2 - 1
    dc = jnp.zeros((cap, 1, 3), jnp.float32)
    if rgb is not None:
        dc = dc.at[:num_faces, 0].set(rgb2sh(jnp.asarray(rgb, jnp.float32)))
    return GaussianParams(
        xyz=jnp.zeros((cap, 3), jnp.float32),
        features_dc=dc,
        features_rest=jnp.zeros((cap, n_rest, 3), jnp.float32),
        scaling=jnp.full((cap, 3), np.log(0.1), jnp.float32),
        rotation=jnp.zeros((cap, 4), jnp.float32).at[:, 0].set(1.0),
        opacity=jnp.full((cap, 1), float(np.log(0.1 / 0.9)), jnp.float32),
        binding=jnp.concatenate([
            jnp.arange(num_faces, dtype=jnp.int32),
            jnp.zeros((cap - num_faces,), jnp.int32)]),
        alive=jnp.arange(cap) < num_faces,
    )


@pytree_dataclass
class FaceFrames:
    """Per-face world-space frames from the posed mesh
    (mesh_gaussian_model.py:122-148)."""
    center: jnp.ndarray    # (F, 3)
    orien_mat: jnp.ndarray  # (F, 3, 3)
    orien_quat: jnp.ndarray  # (F, 4) wxyz
    scaling: jnp.ndarray   # (F, 1)


def face_frames_from_verts(verts: jnp.ndarray, faces: jnp.ndarray) -> FaceFrames:
    tri = verts[faces]
    center = tri.mean(axis=-2)
    orien, scale = geometry.compute_face_orientation(verts, faces)
    return FaceFrames(center=center, orien_mat=orien,
                      orien_quat=geometry.rotmat_to_quat(orien),
                      scaling=scale)


# ----------------------------------------------------------------------
# world-space views (gaussian_model.py:112-163)
# ----------------------------------------------------------------------
def get_xyz(g: GaussianParams, frames: Optional[FaceFrames] = None):
    if frames is None:
        return g.xyz
    om = frames.orien_mat[g.binding]
    xyz = jnp.einsum("nij,nj->ni", om, g.xyz)
    return xyz * frames.scaling[g.binding] + frames.center[g.binding]


def get_scaling(g: GaussianParams, frames: Optional[FaceFrames] = None):
    s = jnp.exp(g.scaling)
    if frames is None:
        return s
    return s * frames.scaling[g.binding]


def get_rotation(g: GaussianParams, frames: Optional[FaceFrames] = None):
    q = geometry.quat_normalize(g.rotation)
    if frames is None:
        return q
    fq = geometry.quat_normalize(frames.orien_quat[g.binding])
    return geometry.quat_multiply(fq, q)


def get_opacity(g: GaussianParams):
    return jax.nn.sigmoid(g.opacity)


def get_features(g: GaussianParams):
    """(N, (deg+1)^2, 3) SH coefficients."""
    return jnp.concatenate([g.features_dc, g.features_rest], axis=1)


def get_covariance(g: GaussianParams, frames: Optional[FaceFrames] = None,
                   scaling_modifier=1.0):
    return geometry.covariance_from_scaling_rotation(
        get_scaling(g, frames), scaling_modifier, get_rotation(g, frames))


# ----------------------------------------------------------------------
# densification (gaussian_model.py:378-526) on padded capacity
# ----------------------------------------------------------------------
@pytree_dataclass
class DensifyState:
    xyz_gradient_accum: jnp.ndarray  # (N, 1)
    denom: jnp.ndarray               # (N, 1)
    max_radii2d: jnp.ndarray         # (N,)


def init_densify_state(capacity: int) -> DensifyState:
    return DensifyState(jnp.zeros((capacity, 1), jnp.float32),
                        jnp.zeros((capacity, 1), jnp.float32),
                        jnp.zeros((capacity,), jnp.float32))


def add_densification_stats(ds: DensifyState, viewspace_grad, radii,
                            visible) -> DensifyState:
    """gaussian_model.py:524-526."""
    gn = jnp.linalg.norm(viewspace_grad[:, :2], axis=-1, keepdims=True)
    return DensifyState(
        xyz_gradient_accum=ds.xyz_gradient_accum + jnp.where(
            visible[:, None], gn, 0.0),
        denom=ds.denom + visible[:, None].astype(ds.denom.dtype),
        max_radii2d=jnp.maximum(ds.max_radii2d,
                                jnp.where(visible, radii, 0.0)))


def _binding_counter(g: GaussianParams, num_faces: int):
    return jnp.zeros((num_faces,), jnp.int32).at[g.binding].add(
        g.alive.astype(jnp.int32))


def densify_and_prune(g: GaussianParams, ds: DensifyState, frames: FaceFrames,
                      num_faces: int, max_grad: float, min_opacity: float,
                      extent: float, percent_dense: float = 0.01,
                      key=None, n_split: int = 2,
                      max_screen_size: Optional[float] = None):
    """Clone + split + prune in padded capacity
    (gaussian_model.py:453-521).  Free slots are consumed in order; when
    capacity runs out the lowest-priority new points are dropped (the
    reference would have grown the arrays).  ``max_screen_size`` prunes
    gaussians whose accumulated max 2D radius exceeds it (the reference's
    size_threshold=20 px after the first opacity reset,
    train_appearance.py:252).  Returns (params, fresh stats)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    cap = g.capacity
    grads = ds.xyz_gradient_accum / jnp.maximum(ds.denom, 1e-12)
    grads = jnp.nan_to_num(grads[:, 0])
    scaling = get_scaling(g, frames)
    max_scale = jnp.max(scaling, axis=1)

    # --- clone: small gaussians with high view-space gradient -----------
    clone_mask = g.alive & (grads >= max_grad) & \
        (max_scale <= percent_dense * extent)
    # --- split: large gaussians with high view-space gradient -----------
    split_mask = g.alive & (grads >= max_grad) & \
        (max_scale > percent_dense * extent)

    # new points wanted: clones (1 copy) + splits (n_split copies)
    free = ~g.alive
    n_free = jnp.sum(free)

    def alloc_slots(want_mask, copies, start_rank):
        """Rank requested copies into free slots (static shapes)."""
        want = jnp.repeat(want_mask, copies) if copies > 1 else want_mask
        src = jnp.repeat(jnp.arange(cap), copies) if copies > 1 else \
            jnp.arange(cap)
        rank = jnp.cumsum(want.astype(jnp.int32)) - 1 + start_rank
        free_slots = jnp.cumsum(free.astype(jnp.int32)) - 1
        # slot index for rank r = position of r-th free slot
        slot_of_rank = jnp.full((cap,), cap, jnp.int32)
        slot_of_rank = slot_of_rank.at[
            jnp.where(free, free_slots, cap)].set(jnp.arange(cap),
                                                  mode="drop")
        ok = want & (rank < n_free)
        dst = jnp.where(ok, slot_of_rank[jnp.clip(rank, 0, cap - 1)], cap)
        return src, dst, ok, start_rank + jnp.sum(want.astype(jnp.int32))

    src_c, dst_c, ok_c, next_rank = alloc_slots(clone_mask, 1, 0)
    src_s, dst_s, ok_s, _ = alloc_slots(split_mask, n_split, next_rank)

    def scatter_copy(arr, src, dst, ok, new_vals=None):
        vals = arr[src] if new_vals is None else new_vals
        return arr.at[jnp.where(ok, dst, cap)].set(vals, mode="drop")

    out = g
    # clones copy verbatim (gaussian_model.py:495-511)
    for field in ("xyz", "features_dc", "features_rest", "scaling",
                  "rotation", "opacity", "binding"):
        arr = getattr(out, field)
        out = dataclasses.replace(out, **{field: scatter_copy(
            arr, src_c, dst_c, ok_c)})

    # splits sample offsets in the gaussian and shrink (gaussian_model.py:453-481)
    stds = jnp.exp(g.scaling)[src_s]
    samples = jax.random.normal(key, stds.shape) * stds
    rots = geometry.quat_to_rotmat(g.rotation[src_s])
    new_xyz = jnp.einsum("nij,nj->ni", rots, samples) + g.xyz[src_s]
    new_scaling = jnp.log(jnp.exp(g.scaling[src_s]) / (0.8 * n_split))
    for field, vals in (
            ("xyz", new_xyz), ("scaling", new_scaling),
            ("features_dc", g.features_dc[src_s]),
            ("features_rest", g.features_rest[src_s]),
            ("rotation", g.rotation[src_s]),
            ("opacity", g.opacity[src_s]),
            ("binding", g.binding[src_s])):
        arr = getattr(out, field)
        out = dataclasses.replace(out, **{field: scatter_copy(
            arr, src_s, dst_s, ok_s, vals)})

    alive = out.alive
    alive = alive.at[jnp.where(ok_c, dst_c, cap)].set(True, mode="drop")
    alive = alive.at[jnp.where(ok_s, dst_s, cap)].set(True, mode="drop")

    # prune: originals that were split (only when BOTH children landed in
    # free slots); low opacity; oversized
    split_ordinal = jnp.cumsum(split_mask.astype(jnp.int32)) - 1
    prune = split_mask & (next_rank + n_split * split_ordinal
                          + (n_split - 1) < n_free)
    prune = prune | (get_opacity(out)[:, 0] < min_opacity)
    if max_screen_size is not None:
        prune = prune | (ds.max_radii2d > max_screen_size)
        prune = prune | (jnp.max(get_scaling(out, frames), axis=1)
                         > 0.1 * extent)
    prune = prune & alive

    out = dataclasses.replace(out, alive=alive)
    # keep >= 1 gaussian per face (gaussian_model.py:378-385)
    counter = _binding_counter(out, num_faces)
    to_prune_per_face = jnp.zeros((num_faces,), jnp.int32).at[
        out.binding].add(prune.astype(jnp.int32))
    redundant = (counter - to_prune_per_face) > 0
    prune = prune & redundant[out.binding]

    out = dataclasses.replace(out, alive=alive & ~prune)
    return out, init_densify_state(cap)


def reset_opacity(g: GaussianParams, ceiling: float = 0.01) -> GaussianParams:
    """gaussian_model.py:284-287."""
    new_op = jnp.minimum(g.opacity, inverse_sigmoid(jnp.asarray(ceiling)))
    return dataclasses.replace(g, opacity=new_op)


def init_from_pcd(points, colors, sh_degree: int,
                  capacity: Optional[int] = None) -> GaussianParams:
    """Unbound 3DGS init from a point cloud (create_from_pcd,
    gaussian_model.py:172-210): scales from the mean squared distance to
    the 3 nearest neighbours (the CUDA distCUDA2, replaced by the native
    KD-tree)."""
    n = len(points)
    cap = capacity or n
    n_rest = (sh_degree + 1) ** 2 - 1
    try:
        from ..native import knn
        dist2 = np.maximum(knn.mean_dist2_3nn(np.asarray(points)), 1e-7)
    except Exception:
        d2 = np.sum((np.asarray(points)[:, None]
                     - np.asarray(points)[None]) ** 2, -1)
        np.fill_diagonal(d2, np.inf)
        dist2 = np.maximum(np.sort(d2, 1)[:, :3].mean(1), 1e-7)
    scales = np.log(np.sqrt(dist2))[:, None].repeat(3, 1)
    return GaussianParams(
        xyz=jnp.zeros((cap, 3), jnp.float32).at[:n].set(
            jnp.asarray(points, jnp.float32)),
        features_dc=jnp.zeros((cap, 1, 3), jnp.float32).at[:n, 0].set(
            rgb2sh(jnp.asarray(colors, jnp.float32))),
        features_rest=jnp.zeros((cap, n_rest, 3), jnp.float32),
        scaling=jnp.zeros((cap, 3), jnp.float32).at[:n].set(
            jnp.asarray(scales, jnp.float32)),
        rotation=jnp.zeros((cap, 4), jnp.float32).at[:, 0].set(1.0),
        opacity=jnp.full((cap, 1), float(np.log(0.1 / 0.9)), jnp.float32),
        binding=jnp.zeros((cap,), jnp.int32),
        alive=jnp.arange(cap) < n,
    )
