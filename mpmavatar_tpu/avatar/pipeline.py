"""Avatar deformation pipeline: tracked mesh <-> SMPL-X poses.

Port of Trainer.load_smplx (/root/reference/train_material_params.py:
269-355): invert the first tracked frame to the canonical pose with
KNN-transferred (or precomputed/inpainted) skinning weights, then
forward-LBS the canonical mesh to every test pose.  Pure JAX; batch over
poses with vmap.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from . import lbs
from .smplx import SMPLXModel, smplx_forward


def deform_tracked_to_poses(model: SMPLXModel,
                            first_frame_verts: jnp.ndarray,
                            first_params: Dict,
                            pose_params: Dict,
                            lbs_w: Optional[jnp.ndarray] = None,
                            k: int = 10):
    """Returns (deformed_verts (B, V, 3), smplx_out_poses, lbs_w).

    first_frame_verts: tracked avatar vertices at the reference frame;
    first_params / pose_params: SMPL-X parameter dicts (pose_params
    batched with leading B).
    """
    out_first = smplx_forward(model, first_params)
    trans0 = first_params.get("trans")
    scale0 = first_params.get("scale")

    t_verts, _, w = lbs.transform_to_t_pose(
        jnp.asarray(first_frame_verts), out_first.vertices[0],
        out_first.transform_mat[0],
        lbs_weights_packed=model.lbs_weights,
        lbs_w=lbs_w,
        global_transl=None if trans0 is None else trans0[0],
        scale=None if scale0 is None else jnp.reshape(scale0, ())[None][0],
        k=k)

    out_poses = smplx_forward(model, pose_params)
    transp = pose_params.get("trans")
    scalep = pose_params.get("scale")

    def pose_one(rel_tf, tr, sc):
        v, _ = lbs.transform_to_pose(t_verts, w, rel_tf,
                                     global_transl=tr, scale=sc)
        return v

    b = out_poses.transform_mat.shape[0]
    trs = (transp if transp is not None
           else jnp.zeros((b, 3), t_verts.dtype))
    scs = (jnp.broadcast_to(jnp.reshape(jnp.asarray(scalep), (-1,)), (b,))
           if scalep is not None else jnp.ones((b,), t_verts.dtype))
    deformed = jax.vmap(pose_one)(out_poses.transform_mat, trs, scs)
    return deformed, out_poses, w


def frame_velocities(seq: jnp.ndarray, fps: float = 25.0) -> jnp.ndarray:
    """(T, N, 3) positions -> (T-1, N, 3) velocities
    (train_material_params.py:256,282,352-354)."""
    return (seq[1:] - seq[:-1]) * fps
