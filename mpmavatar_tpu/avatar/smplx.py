"""SMPL-X body model in pure JAX.

Replaces the ``smplx`` package + SmplxDeformer wrapper of the reference
(/root/reference/utils/smplx_deformer.py:18-157): loads the official
SMPLX_*.npz directly and computes vertices, joints and per-joint rigid
transforms under jit.  Full-pose layout (55 joints):
[global_orient, 21 body, jaw, leye, reye, 15 lhand, 15 rhand].
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..core.types import pytree_dataclass
from . import lbs

NUM_BODY_JOINTS = 21
NUM_HAND_JOINTS = 15


@pytree_dataclass(static_fields=("parents",))
class SMPLXModel:
    """Model constants from SMPLX_{gender}.npz."""
    v_template: jnp.ndarray      # (V, 3)
    shapedirs: jnp.ndarray       # (V, 3, n_betas)
    expr_dirs: jnp.ndarray       # (V, 3, n_expr)
    posedirs: jnp.ndarray        # (P, V*3) pose blend basis
    j_regressor: jnp.ndarray     # (J, V)
    lbs_weights: jnp.ndarray     # (V, J)
    parents: tuple               # (J,) static ints
    faces: jnp.ndarray           # (F, 3) int32
    hands_componentsl: Optional[jnp.ndarray] = None  # (n_pca, 45)
    hands_componentsr: Optional[jnp.ndarray] = None
    hands_meanl: Optional[jnp.ndarray] = None        # (45,)
    hands_meanr: Optional[jnp.ndarray] = None


def load_smplx_npz(path: str, num_betas: int = 300, num_expr: int = 100,
                   use_pca: bool = False, num_pca_comps: int = 12
                   ) -> SMPLXModel:
    """Load the official SMPL-X npz archive."""
    data = np.load(path, allow_pickle=True)
    shapedirs_full = np.asarray(data["shapedirs"], np.float32)
    # SMPL-X packs 300 shape + 100 expression dirs along the last axis.
    shapedirs = shapedirs_full[:, :, :num_betas]
    expr_dirs = shapedirs_full[:, :, 300:300 + num_expr]
    return SMPLXModel(
        v_template=jnp.asarray(data["v_template"], jnp.float32),
        shapedirs=jnp.asarray(shapedirs),
        expr_dirs=jnp.asarray(expr_dirs),
        # npz stores (V, 3, P); the lbs convention is (P, V*3)
        posedirs=jnp.asarray(np.asarray(data["posedirs"], np.float32)
                             .reshape(len(data["v_template"]) * 3, -1).T),
        j_regressor=jnp.asarray(data["J_regressor"], jnp.float32),
        lbs_weights=jnp.asarray(data["weights"], jnp.float32),
        # kintree_table[0,0] is uint32(-1) for the root
        parents=tuple(
            -1 if p >= 2 ** 31 else int(p)
            for p in (np.asarray(data["kintree_table"])[0]
                      if "kintree_table" in data
                      else np.asarray(data["parents"])).astype(np.int64)),
        faces=jnp.asarray(np.asarray(data["f"], np.int64), jnp.int32),
        hands_componentsl=jnp.asarray(data["hands_componentsl"][:num_pca_comps],
                                      jnp.float32) if use_pca else None,
        hands_componentsr=jnp.asarray(data["hands_componentsr"][:num_pca_comps],
                                      jnp.float32) if use_pca else None,
        hands_meanl=jnp.asarray(data["hands_meanl"], jnp.float32)
        if "hands_meanl" in data else None,
        hands_meanr=jnp.asarray(data["hands_meanr"], jnp.float32)
        if "hands_meanr" in data else None,
    )


@pytree_dataclass
class SMPLXOutput:
    vertices: jnp.ndarray       # (B, V, 3)
    joints: jnp.ndarray         # (B, J, 3)
    v_shaped: jnp.ndarray       # (B, V, 3)
    transform_mat: jnp.ndarray  # (B, J, 4, 4)
    full_pose: jnp.ndarray      # (B, J*3)


def smplx_forward(model: SMPLXModel, params: Dict[str, jnp.ndarray],
                  use_pose_blendshapes: bool = True) -> SMPLXOutput:
    """SMPL-X forward + per-joint transforms
    (smplx_deformer.py:73-133 / smplx.lbs.lbs).

    params keys: trans (B,3), orient (B,3), body_pose (B,63),
    beta (B,n_betas), expr (B,n_expr), jaw_pose/left_eye_pose/
    right_eye_pose (B,3), left_hand_pose/right_hand_pose (B,45 or
    (B,n_pca) if the model uses PCA), scale () or (B,).
    """
    b = params["body_pose"].shape[0]
    dtype = model.v_template.dtype

    def get(name, dim):
        if name in params and params[name] is not None:
            return params[name].astype(dtype)
        return jnp.zeros((b, dim), dtype)

    n_joints = len(model.parents)
    segments = [get("orient", 3), params["body_pose"].astype(dtype)]
    if n_joints == 1 + NUM_BODY_JOINTS + 3 + 2 * NUM_HAND_JOINTS:
        # full SMPL-X: jaw, eyes, hands (with optional PCA hand coding)
        lh = get("left_hand_pose", 45)
        rh = get("right_hand_pose", 45)
        if model.hands_componentsl is not None and \
                lh.shape[-1] == model.hands_componentsl.shape[0]:
            lh = model.hands_meanl[None] + lh @ model.hands_componentsl
            rh = model.hands_meanr[None] + rh @ model.hands_componentsr
        segments += [get("jaw_pose", 3), get("left_eye_pose", 3),
                     get("right_eye_pose", 3), lh, rh]
    full_pose = jnp.concatenate(segments, axis=-1)

    shape_components = jnp.concatenate(
        [get("beta", model.shapedirs.shape[-1]),
         get("expr", model.expr_dirs.shape[-1])], axis=-1)
    shapedirs = jnp.concatenate([model.shapedirs, model.expr_dirs], axis=-1)
    v_shaped = model.v_template[None] + lbs.blend_shapes(shape_components,
                                                         shapedirs)
    joints = lbs.vertices2joints(model.j_regressor, v_shaped)

    rot_mats = lbs.batch_rodrigues(full_pose.reshape(-1, 3)).reshape(
        b, n_joints, 3, 3)

    if use_pose_blendshapes:
        eye = jnp.eye(3, dtype=dtype)
        pose_feature = (rot_mats[:, 1:] - eye).reshape(b, -1)
        pose_offsets = (pose_feature @ model.posedirs).reshape(b, -1, 3)
        v_posed = v_shaped + pose_offsets
    else:
        v_posed = v_shaped

    posed_joints, rel_tf = lbs.batch_rigid_transform(rot_mats, joints,
                                                     model.parents)
    w = model.lbs_weights
    t = jnp.einsum("vj,bjxy->bvxy", w, rel_tf)
    hom = jnp.concatenate([v_posed, jnp.ones(v_posed.shape[:-1] + (1,),
                                             dtype)], axis=-1)
    verts = jnp.einsum("bvac,bvc->bva", t, hom)[..., :3]

    trans = params.get("trans")
    if trans is not None:
        verts = verts + trans[:, None, :]
        posed_joints = posed_joints + trans[:, None, :]
    scale = params.get("scale")
    if scale is not None:
        scale = jnp.reshape(jnp.asarray(scale, dtype), (-1, 1, 1))
        verts = verts * scale
        posed_joints = posed_joints * scale

    return SMPLXOutput(vertices=verts, joints=posed_joints,
                       v_shaped=v_shaped, transform_mat=rel_tf,
                       full_pose=full_pose)


def make_test_rig(n_joints=4, n_verts=64, seed=0):
    """Tiny synthetic articulated rig for unit tests (no SMPL-X data
    files in CI)."""
    rng = np.random.default_rng(seed)
    v = rng.uniform(-0.5, 0.5, (n_verts, 3)).astype(np.float32)
    v[:, 1] = np.linspace(0, 1, n_verts)
    joints_y = np.linspace(0.0, 1.0, n_joints)
    jr = np.zeros((n_joints, n_verts), np.float32)
    for j in range(n_joints):
        d = np.abs(v[:, 1] - joints_y[j])
        jr[j] = np.exp(-20 * d)
        jr[j] /= jr[j].sum()
    w = np.zeros((n_verts, n_joints), np.float32)
    for i in range(n_verts):
        d = np.abs(joints_y - v[i, 1]) + 1e-3
        w[i] = d ** -2
        w[i] /= w[i].sum()
    faces = np.stack([np.arange(n_verts - 2), np.arange(1, n_verts - 1),
                      np.arange(2, n_verts)], -1).astype(np.int32)
    return SMPLXModel(
        v_template=jnp.asarray(v),
        shapedirs=jnp.asarray(rng.normal(0, 0.01,
                                         (n_verts, 3, 5)).astype(np.float32)),
        expr_dirs=jnp.zeros((n_verts, 3, 2), jnp.float32),
        posedirs=jnp.asarray(rng.normal(
            0, 0.001, ((n_joints - 1) * 9, n_verts * 3)).astype(np.float32)),
        j_regressor=jnp.asarray(jr),
        lbs_weights=jnp.asarray(w),
        parents=tuple([-1] + list(range(n_joints - 1))),
        faces=jnp.asarray(faces))
