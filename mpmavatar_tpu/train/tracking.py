"""Stage-1 photometric mesh tracking (per-timestep mesh fitting).

Port of /root/reference/preprocess/train_mesh_lbs_actorshq.py:100-519:
one gaussian per face at the barycenter with a face-frame rotation and a
flattened (near-2D) scale; per-timestep optimization of mesh vertices +
per-face colors/opacity/scale + per-camera color calibration against
multi-view images, with mesh regularizers and a cloth-body collision
penalty; SMPL-X is fit jointly (here: its pose parameters via the same
optax step).  Inertia warm-start between frames; LBS re-posing of
non-cloth vertices is provided by the caller (avatar.lbs).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.linalg import safe_norm, safe_normalize
from ..render import camera_arrays, rasterize
from ..render.geometry import (compute_face_orientation, find_adjacent_faces,
                               rotmat_to_quat)
from ..utils.losses import collision_loss, l1_loss, ssim


@dataclasses.dataclass
class TrackingConfig:
    """Loss weights / lrs (train_mesh_lbs_actorshq.py defaults)."""
    img_weight: float = 1.0
    iso_weight: float = 4000.0
    normal_weight: float = 0.05
    opacity_weight: float = 0.05
    area_weight: float = 10.0
    eq_faces_weight: float = 10.0
    soft_color_weight: float = 0.02
    collision_weight: float = 100.0
    lr_means3d: float = 0.00016
    lr_colors: float = 0.0025
    iters_first: int = 10000
    iters_rest: int = 3000
    tile_capacity: int = 512


def init_tracking_params(verts, faces, max_cams=160) -> Dict:
    """initialize_params (train_mesh_lbs_actorshq.py:112-180)."""
    from ..native import knn
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int32)
    bary = verts[faces].mean(1)
    d2, _ = knn.query(bary, bary, 4)
    mean3 = np.clip(d2[:, 1:].mean(-1), 1e-7, None)
    scales = np.tile(np.log(np.sqrt(mean3))[:, None], (1, 3))
    scales[:, 2] = -100.0  # flatten the splats onto the surface
    return {
        "vertices": jnp.asarray(verts),
        "rgb_colors": jnp.zeros((len(faces), 3), jnp.float32),
        "logit_opacities": jnp.zeros((len(faces), 1), jnp.float32),
        "log_scales": jnp.asarray(scales),
        "cam_m": jnp.zeros((max_cams, 3), jnp.float32),
        "cam_c": jnp.zeros((max_cams, 3), jnp.float32),
    }


def init_tracking_variables(verts, faces, cloth_v_idx=None) -> Dict:
    faces = np.asarray(faces)
    bary = np.asarray(verts)[faces].mean(1)
    nb = find_adjacent_faces(faces)
    sq = np.sum((bary[nb] - bary[:, None]) ** 2, -1)
    return {
        "faces": jnp.asarray(faces, jnp.int32),
        "face_neighbors": jnp.asarray(nb, jnp.int32),
        "neighbor_weight": jnp.asarray(np.exp(-2000 * sq), jnp.float32),
        "neighbor_dist": jnp.asarray(np.sqrt(sq), jnp.float32),
        "cloth_v_idx": (jnp.asarray(cloth_v_idx, jnp.int32)
                        if cloth_v_idx is not None else None),
    }


def params2rendervar(params: Dict, faces):
    """Gaussian-per-face render variables
    (train_mesh_lbs_actorshq.py:209-225)."""
    verts = params["vertices"]
    means3d = verts[faces].mean(1)
    orien, _ = compute_face_orientation(verts, faces)
    rotations = rotmat_to_quat(orien)
    return {
        "means3d": means3d,
        "colors": params["rgb_colors"],
        "rotations": rotations,
        "opacities": jax.nn.sigmoid(params["logit_opacities"])[:, 0],
        "scales": jnp.exp(params["log_scales"]),
    }


def _face_normals(verts, faces):
    vf = verts[faces]
    return safe_normalize(jnp.cross(vf[:, 1] - vf[:, 0], vf[:, 2] - vf[:, 0]))


def tracking_loss(params: Dict, variables: Dict, ca, width, height,
                  cam_id, gt_im, gt_msk, smplx_v, smplx_vn,
                  prev_col, is_initial: bool, cfg: TrackingConfig):
    """get_loss (train_mesh_lbs_actorshq.py:231-292)."""
    from ..render.geometry import covariance_from_scaling_rotation

    faces = variables["faces"]
    rv = params2rendervar(params, faces)
    cov3d = covariance_from_scaling_rotation(rv["scales"], 1.0,
                                             rv["rotations"])
    out = rasterize(rv["means3d"], rv["colors"], rv["opacities"], cov3d,
                    ca, jnp.zeros(3), width=width, height=height,
                    tile_capacity=cfg.tile_capacity)
    im = jnp.exp(params["cam_m"][cam_id])[:, None, None] * out["render"] \
        + params["cam_c"][cam_id][:, None, None]

    losses = {}
    losses["im"] = cfg.img_weight * (
        0.8 * l1_loss(im, gt_im) + 0.2 * (1.0 - ssim(im, gt_im)))
    losses["msk"] = l1_loss(out["alpha"], gt_msk)
    losses["scale"] = jnp.mean(rv["scales"][:, -1])

    fn = _face_normals(params["vertices"], faces)
    nb = variables["face_neighbors"]
    ndot = jnp.sum(fn[:, None] * fn[nb], -1).mean(-1)
    losses["normal"] = cfg.normal_weight * jnp.mean(jnp.abs(ndot - 1.0))
    losses["opacity"] = cfg.opacity_weight * jnp.mean(1.0 - rv["opacities"])

    bary = params["vertices"][faces].mean(1)
    off = bary[nb] - bary[:, None]
    mag = jnp.sqrt(jnp.sum(off ** 2, -1) + 1e-20)
    losses["iso"] = cfg.iso_weight * jnp.mean(
        variables["neighbor_weight"] * (mag - variables["neighbor_dist"])
        ** 2)

    vf = params["vertices"][faces]
    area = 0.5 * safe_norm(jnp.cross(vf[:, 1] - vf[:, 0],
                                     vf[:, 2] - vf[:, 0]), axis=1)
    g_area = rv["scales"][:, 0] * rv["scales"][:, 1] * jnp.pi
    losses["area"] = cfg.area_weight * jnp.mean(jnp.abs(area - g_area))
    losses["eq_faces"] = cfg.eq_faces_weight * jnp.mean(
        jnp.abs(area - jnp.mean(area)))

    if variables.get("cloth_v_idx") is not None:
        cloth_v = params["vertices"][variables["cloth_v_idx"]]
        losses["collision"] = cfg.collision_weight * collision_loss(
            cloth_v, smplx_v, smplx_vn)

    if not is_initial and prev_col is not None:
        losses["soft_col"] = cfg.soft_color_weight * l1_loss(
            params["rgb_colors"], prev_col)

    return sum(losses.values()), losses


class MeshTracker:
    """Per-timestep tracking driver (train loop of
    train_mesh_lbs_actorshq.py:408-519, simplified to numpy-array IO).

    With ``smplx_model`` (+ optional ``vposer``) given, each timestep
    jointly optimizes the SMPL-X fit alongside the mesh: the VPoser
    latent (or raw body_pose) every frame and betas at t0 only, driven
    through the cloth-body collision penalty with a separate Adam —
    exactly the reference's two-optimizer loop (:433-469)."""

    def __init__(self, verts0, faces, cfg: TrackingConfig = None,
                 cloth_v_idx=None, max_cams=160, scene_radius=1.0,
                 smplx_model=None, vposer=None, smplx_faces=None,
                 lr_smplx: float = 1e-4):
        self.cfg = cfg or TrackingConfig()
        self.params = init_tracking_params(verts0, faces, max_cams)
        self.variables = init_tracking_variables(verts0, faces, cloth_v_idx)
        self.prev_col = None
        self.prev_verts = [jnp.asarray(verts0, jnp.float32)]
        lrs = {
            "vertices": self.cfg.lr_means3d * scene_radius,
            "rgb_colors": self.cfg.lr_colors,
            "logit_opacities": 0.05,
            "log_scales": 0.001,
            "cam_m": 1e-4,
            "cam_c": 1e-4,
        }
        self.tx = optax.multi_transform(
            {k: optax.adam(v, eps=1e-15) for k, v in lrs.items()},
            {k: k for k in lrs})
        self.opt_state = self.tx.init(self.params)
        self.smplx_model = smplx_model
        self.vposer = vposer
        self.smplx_faces = (jnp.asarray(smplx_faces, jnp.int32)
                            if smplx_faces is not None else None)
        self.lr_smplx = lr_smplx
        self.smplx_train = None      # dict of trainable smplx leaves
        self.smplx_fixed = None      # frozen smplx params
        self.beta = None             # locked after t0
        self._step = self._build_step()

    # ---- joint SMPL-X fitting ---------------------------------------
    def _smplx_geometry(self, train, fixed, model, vposer):
        """Trainable smplx leaves -> (verts (Vs,3), normals).

        ``model``/``vposer`` are threaded as jit ARGUMENTS (their big
        arrays must not be embedded as program constants — the tunneled
        TPU's remote compiler rejects oversized programs)."""
        from ..avatar.smplx import smplx_forward
        from ..avatar.vposer import matrix_to_axis_angle, vposer_decode
        from ..render.geometry import vertex_normals
        p = dict(fixed)
        if "latent" in train:
            rots = vposer_decode(vposer, train["latent"])
            p["body_pose"] = matrix_to_axis_angle(rots).reshape(1, -1)
        elif "body_pose" in train:
            p["body_pose"] = train["body_pose"]
        if "beta" in train:
            p["beta"] = train["beta"]
        out = smplx_forward(model, p)
        v = out.vertices[0]
        return v, vertex_normals(v, self.smplx_faces)

    def set_smplx_frame(self, smplx_param: Dict, is_initial: bool):
        """Split this timestep's SMPL-X params into trainable leaves
        (latent/body_pose; beta at t0) and frozen leaves
        (:433-447)."""
        assert self.smplx_model is not None
        p = {k: jnp.asarray(v) for k, v in smplx_param.items()}
        train_keys = ["latent"] if ("latent" in p and
                                    self.vposer is not None) else \
            ["body_pose"]
        if is_initial:
            train_keys.append("beta")
        self.smplx_train = {k: p[k] for k in train_keys if k in p}
        self.smplx_fixed = {k: v for k, v in p.items()
                            if k not in self.smplx_train}
        if not is_initial and self.beta is not None:
            self.smplx_fixed["beta"] = self.beta
        self.smplx_tx = optax.adam(self.lr_smplx)
        self.smplx_opt_state = self.smplx_tx.init(self.smplx_train)

    def finish_smplx_frame(self, is_initial: bool) -> Dict:
        """Lock betas after t0; returns the full fitted param dict
        (saved like :480)."""
        full = {**self.smplx_fixed, **self.smplx_train}
        if is_initial and "beta" in self.smplx_train:
            self.beta = self.smplx_train["beta"]
        return full

    def _build_step(self):
        cfg = self.cfg
        variables = self.variables

        @partial(jax.jit, static_argnames=("width", "height",
                                           "is_initial"))
        def step(params, opt_state, ca, width, height, cam_id, gt_im,
                 gt_msk, smplx_v, smplx_vn, prev_col, is_initial):
            def loss_fn(p):
                loss, parts = tracking_loss(
                    p, variables, ca, width, height, cam_id, gt_im,
                    gt_msk, smplx_v, smplx_vn, prev_col, is_initial, cfg)
                return loss, parts

            (loss, parts), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, parts

        @partial(jax.jit, static_argnames=("width", "height",
                                           "is_initial"))
        def step_joint(params, opt_state, smplx_train, smplx_opt_state,
                       smplx_fixed, smplx_model, vposer, ca, width,
                       height, cam_id, gt_im, gt_msk, prev_col,
                       is_initial):
            def loss_fn(p, st):
                smplx_v, smplx_vn = self._smplx_geometry(
                    st, smplx_fixed, smplx_model, vposer)
                loss, parts = tracking_loss(
                    p, variables, ca, width, height, cam_id, gt_im,
                    gt_msk, smplx_v, smplx_vn, prev_col, is_initial, cfg)
                return loss, parts

            (loss, parts), (grads, sgrads) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(params,
                                                       smplx_train)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            supd, smplx_opt_state = self.smplx_tx.update(
                sgrads, smplx_opt_state, smplx_train)
            smplx_train = optax.apply_updates(smplx_train, supd)
            return (params, opt_state, smplx_train, smplx_opt_state,
                    loss, parts)

        self._step_joint = step_joint
        return step

    def initialize_per_timestep(self):
        """Inertia warm-start (train_mesh_lbs_actorshq.py:306-333):
        extrapolate vertices with the previous frame's motion."""
        if len(self.prev_verts) >= 2:
            v = self.params["vertices"]
            delta = self.prev_verts[-1] - self.prev_verts[-2]
            self.params = {**self.params, "vertices": v + delta}
        self.prev_col = self.params["rgb_colors"]

    def fit_frame(self, batches, smplx_v=None, smplx_vn=None,
                  is_initial: bool = False,
                  iters: Optional[int] = None):
        """Run `iters` optimization steps over a list of per-camera
        batches (cycled).  With a SMPL-X frame set (set_smplx_frame),
        body geometry is recomputed from the trainable fit every step
        and optimized jointly; otherwise the given static smplx_v/vn
        feed the collision penalty."""
        cfg = self.cfg
        iters = iters or (cfg.iters_first if is_initial else cfg.iters_rest)
        joint = self.smplx_train is not None
        losses = []
        for it in range(iters):
            b = batches[it % len(batches)]
            ca = camera_arrays(b["cam"])
            w, h = b["cam"].image_width, b["cam"].image_height
            if joint:
                (self.params, self.opt_state, self.smplx_train,
                 self.smplx_opt_state, loss, _) = self._step_joint(
                    self.params, self.opt_state, self.smplx_train,
                    self.smplx_opt_state, self.smplx_fixed,
                    self.smplx_model, self.vposer, ca, w, h,
                    b["camera_idx"], jnp.asarray(b["rgb"]),
                    jnp.asarray(b["msk"]), self.prev_col, is_initial)
            else:
                self.params, self.opt_state, loss, _ = self._step(
                    self.params, self.opt_state, ca, w, h,
                    b["camera_idx"], jnp.asarray(b["rgb"]),
                    jnp.asarray(b["msk"]), jnp.asarray(smplx_v),
                    jnp.asarray(smplx_vn), self.prev_col, is_initial)
            losses.append(float(loss))
        self.prev_verts.append(self.params["vertices"])
        if len(self.prev_verts) > 2:
            self.prev_verts = self.prev_verts[-2:]
        return losses

    def repose_human(self, smplx_param_t: Dict, smplx_param_t1: Dict):
        """Inter-frame LBS re-posing of the non-cloth vertices
        (train_mesh_lbs_actorshq.py:495-519): inverse-LBS the human
        layer out of pose t, forward-LBS into pose t+1; cloth vertices
        keep the inertia warm-start."""
        from ..avatar import lbs
        from ..avatar.smplx import smplx_forward
        assert self.smplx_model is not None
        verts = self.params["vertices"]
        n = verts.shape[0]
        cloth_idx = self.variables.get("cloth_v_idx")
        if cloth_idx is None:
            return                      # single-layer garment: nothing
        mask = jnp.ones((n,), bool).at[cloth_idx].set(False)
        hidx = jnp.where(np.asarray(mask))[0]
        if hidx.size == 0:
            return
        p0 = {k: jnp.asarray(v) for k, v in smplx_param_t.items()}
        p1 = {k: jnp.asarray(v) for k, v in smplx_param_t1.items()}
        if self.beta is not None:
            p0["beta"] = p1["beta"] = self.beta
        out0 = smplx_forward(self.smplx_model, p0)
        out1 = smplx_forward(self.smplx_model, p1)
        tr0 = p0.get("trans")
        sc0 = p0.get("scale")
        t_v, _, w = lbs.transform_to_t_pose(
            verts[hidx], out0.vertices[0], out0.transform_mat[0],
            lbs_weights_packed=self.smplx_model.lbs_weights,
            global_transl=None if tr0 is None else tr0[0],
            scale=None if sc0 is None else jnp.reshape(sc0, (-1,))[0])
        tr1 = p1.get("trans")
        sc1 = p1.get("scale")
        v1, _ = lbs.transform_to_pose(
            t_v, w, out1.transform_mat[0],
            global_transl=None if tr1 is None else tr1[0],
            scale=None if sc1 is None else jnp.reshape(sc1, (-1,))[0])
        self.params = {**self.params,
                       "vertices": verts.at[hidx].set(v1)}

    def resume(self, save_dir: str, start_idx: int, resume_t: int):
        """Resume mid-sequence (train_mesh_lbs_actorshq.py:350-370):
        overlay params_{resume_t}.npz on params_{start_idx}.npz and
        reset the inertia history to the resumed frame."""
        import os
        ori = dict(np.load(os.path.join(save_dir,
                                        f"params_{start_idx}.npz")))
        res = dict(np.load(os.path.join(save_dir,
                                        f"params_{resume_t}.npz")))
        ori.update(res)
        for k in ("vertices", "rgb_colors", "logit_opacities",
                  "log_scales", "cam_m", "cam_c"):
            if k in ori:
                self.params = {**self.params, k: jnp.asarray(ori[k])}
        self.prev_verts = [self.params["vertices"]]
        self.prev_col = self.params["rgb_colors"]
        self.opt_state = self.tx.init(self.params)

    def save_frame(self, path, t, cam_count=None):
        """params_{t}.npz with the layout the avatar loader expects
        (mesh_gaussian_model.py:40-56)."""
        np.savez(path,
                 vertices=np.asarray(self.params["vertices"]),
                 faces=np.asarray(self.variables["faces"]),
                 rgb_colors=np.asarray(self.params["rgb_colors"]),
                 log_scales=np.asarray(self.params["log_scales"]),
                 logit_opacities=np.asarray(self.params["logit_opacities"]),
                 cam_m=np.asarray(self.params["cam_m"]),
                 cam_c=np.asarray(self.params["cam_c"]))
