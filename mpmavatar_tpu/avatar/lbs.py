"""Linear blend skinning primitives in pure JAX.

Replaces the smplx.lbs / pytorch3d dependencies of the reference
(/root/reference/utils/smplx_deformer.py:1-16): rodrigues, rigid
transform chains, blend shapes, KNN weight transfer, forward/inverse LBS.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.linalg import safe_norm


def batch_rodrigues(rot_vecs: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (N, 3) -> rotation matrices (N, 3, 3) (smplx.lbs)."""
    angle = safe_norm(rot_vecs + 1e-8, axis=-1, keepdims=True)
    rot_dir = rot_vecs / angle
    cos = jnp.cos(angle)[..., None]
    sin = jnp.sin(angle)[..., None]
    rx, ry, rz = rot_dir[..., 0], rot_dir[..., 1], rot_dir[..., 2]
    zeros = jnp.zeros_like(rx)
    k = jnp.stack([zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros],
                  axis=-1).reshape(rot_vecs.shape[:-1] + (3, 3))
    eye = jnp.eye(3, dtype=rot_vecs.dtype)
    return eye + sin * k + (1.0 - cos) * (k @ k)


def blend_shapes(betas: jnp.ndarray, shape_dirs: jnp.ndarray) -> jnp.ndarray:
    """(B, L) x (V, 3, L) -> (B, V, 3)."""
    return jnp.einsum("bl,vcl->bvc", betas, shape_dirs)


def vertices2joints(j_regressor: jnp.ndarray, vertices: jnp.ndarray
                    ) -> jnp.ndarray:
    """(J, V) x (B, V, 3) -> (B, J, 3)."""
    return jnp.einsum("jv,bvc->bjc", j_regressor, vertices)


def batch_rigid_transform(rot_mats: jnp.ndarray, joints: jnp.ndarray,
                          parents) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forward-kinematics chain (smplx.lbs.batch_rigid_transform).

    rot_mats (B, J, 3, 3); joints (B, J, 3); parents (J,) with
    parents[0] = -1.  Returns (posed_joints (B, J, 3),
    rel_transforms (B, J, 4, 4)) where rel_transforms maps rest-pose
    points rigidly attached to each joint to their posed position.
    """
    parents = [int(p) for p in parents]
    b, j = joints.shape[:2]
    rel_joints = joints.at[:, 1:].add(
        -joints[:, [max(p, 0) for p in parents[1:]]])

    def make_tf(r, t):
        top = jnp.concatenate([r, t[..., None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], r.dtype), r.shape[:-2] + (1, 4))
        return jnp.concatenate([top, bottom], axis=-2)

    local = make_tf(rot_mats, rel_joints)           # (B, J, 4, 4)
    chains = [local[:, 0]]
    for i in range(1, j):
        chains.append(chains[parents[i]] @ local[:, i])
    transforms = jnp.stack(chains, axis=1)          # (B, J, 4, 4)
    posed_joints = transforms[..., :3, 3]

    # subtract rest joint contribution: A = G - pack(G @ [j; 0])
    joints_hom = jnp.concatenate(
        [joints, jnp.zeros((b, j, 1), joints.dtype)], axis=-1)
    init_bone = jnp.einsum("bjac,bjc->bja", transforms, joints_hom)
    rel = transforms.at[..., :3, 3].add(-init_bone[..., :3])
    return posed_joints, rel


def knn(points: jnp.ndarray, verts: jnp.ndarray, k: int,
        points_normals=None, verts_normals=None, normal_weight=0.1):
    """Squared-distance KNN via top-k (replaces pytorch3d knn_points,
    smplx_deformer.py:164-186).  points (P, 3), verts (V, 3)."""
    if points_normals is not None:
        points = jnp.concatenate([points, normal_weight * points_normals], -1)
        verts = jnp.concatenate([verts, normal_weight * verts_normals], -1)
    d2 = jnp.sum((points[:, None, :] - verts[None, :, :]) ** 2, axis=-1)
    neg, idx = jax.lax.top_k(-d2, k)
    return -neg, idx


def shepard_weights(points, verts, k, p=2, points_normals=None,
                    verts_normals=None, normal_weight=0.1):
    """Inverse-distance-power weights over KNN
    (smplx_deformer.py:188-205)."""
    dists, idx = knn(points, verts, k, points_normals, verts_normals,
                     normal_weight)
    dists = jnp.maximum(dists, 1e-8)
    w = dists ** (-p)
    return w / jnp.sum(w, axis=-1, keepdims=True), idx


def skinning_transforms(weights: jnp.ndarray, rel_transforms: jnp.ndarray
                        ) -> jnp.ndarray:
    """(P, J) x (J, 4, 4) -> per-point blended transforms (P, 4, 4)."""
    j = rel_transforms.shape[0]
    return (weights @ rel_transforms.reshape(j, 16)).reshape(-1, 4, 4)


def apply_transforms(t: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """(P, 4, 4) x (P, 3) -> (P, 3)."""
    return jnp.einsum("pab,pb->pa", t[:, :3, :3], points) + t[:, :3, 3]


def transform_to_t_pose(vertices, smplx_verts, rel_transforms,
                        lbs_weights_packed=None, lbs_w=None,
                        global_transl=None, scale=None, k=10,
                        v_normals=None, smplx_normals=None,
                        normal_weight=0.1):
    """Inverse LBS (smplx_deformer.py:207-288), single example.

    vertices (P, 3) posed points; smplx_verts (V, 3) posed body;
    rel_transforms (J, 4, 4).  Returns (t_pose_points, T_inv, W)."""
    if lbs_w is None:
        pw, pidx = shepard_weights(vertices, smplx_verts, k=k, p=2,
                                   points_normals=v_normals,
                                   verts_normals=smplx_normals,
                                   normal_weight=normal_weight)
        w = jnp.einsum("pkj,pk->pj", lbs_weights_packed[pidx], pw)
    else:
        w = lbs_w
    t = skinning_transforms(w, rel_transforms)
    t_inv = jnp.linalg.inv(t)
    pts = vertices
    if scale is not None:
        pts = pts / scale
    if global_transl is not None:
        pts = pts - global_transl
    return apply_transforms(t_inv, pts), t_inv, w


def transform_to_pose(vertices, lbs_w, rel_transforms, global_transl=None,
                      scale=None):
    """Forward LBS of canonical points (smplx_deformer.py:290-337)."""
    t = skinning_transforms(lbs_w, rel_transforms)
    out = apply_transforms(t, vertices)
    if global_transl is not None:
        out = out + global_transl
    if scale is not None:
        out = out * scale
    return out, t
