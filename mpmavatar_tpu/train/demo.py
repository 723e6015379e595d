"""Zero-shot interaction demo building blocks.

Port of /root/reference/run_demo.py:61-615 and utils/demo_utils.py: the
avatar sits on an external object (chair) while sand particles are poured
and released gradually; everything is rendered with extra gaussians along
a 360-degree orbit.  Exercises the ``traditional`` (sand, Drucker-Prager)
particle block alongside the anisotropic cloth elements — the mixed-type
configuration of the MPM core.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from ..core import types
from ..render.cameras import Camera
from ..sim import MPMSolver, SimTransform, reset_density, set_parameters_dict


def get_sand(center=(-0.4, 1.8, -0.1), length=(0.8, 0.04, 0.2),
             res=(200, 10, 50), noise=0.01, seed=0):
    """Sand block generator (utils/demo_utils.py:6-24).

    Returns (positions (N, 3), per-particle volume (N,))."""
    rng = np.random.default_rng(seed)
    g = np.stack(np.meshgrid(np.arange(res[1]), np.arange(res[2]),
                             np.arange(res[0]), indexing="ij"),
                 -1).reshape(-1, 3).astype(np.float32)[:, [2, 0, 1]]
    g /= np.array([[res[0] - 1, res[1] - 1, res[2] - 1]], np.float32)
    g *= np.array([length], np.float32)
    g += np.array([center], np.float32)
    g += rng.normal(0, noise, g.shape).astype(np.float32)
    n = res[0] * res[1] * res[2]
    vol = (length[0] * length[1] * length[2] / n) * np.ones(n, np.float32)
    return g, vol


def _trans_xyz(x, y, z):
    m = np.eye(4)
    m[:3, 3] = [x, y, z]
    return m


def _rot_phi(phi):
    m = np.eye(4)
    c, s = np.cos(phi), np.sin(phi)
    m[1, 1], m[1, 2], m[2, 1], m[2, 2] = c, -s, s, c
    return m


def _rot_theta(th):
    m = np.eye(4)
    c, s = np.cos(th), np.sin(th)
    m[0, 0], m[0, 2], m[2, 0], m[2, 2] = c, -s, s, c
    return m


def pose_spherical(theta, phi, x, y, z):
    """demo_utils.py:44-48."""
    c2w = _trans_xyz(x, y, z)
    c2w = _rot_phi(phi / 180.0 * np.pi) @ c2w
    c2w = _rot_theta(theta / 180.0 * np.pi) @ c2w
    return c2w


def get_spherical_cam(ref_cam: Camera, num_frames: int):
    """360-degree orbit cameras (demo_utils.py:50-57)."""
    w, h = ref_cam.image_width, ref_cam.image_height
    k = np.array([[ref_cam.fx, 0.0, 0.5 * w], [0.0, ref_cam.fy, 0.5 * h],
                  [0.0, 0.0, 1.0]])
    c2ws = np.stack([pose_spherical(a, -10.0, 0.0, 1.1, 3.0)
                     for a in np.linspace(0, 360, num_frames + 1)[:-1]], 0)
    c2ws[:, :3, 1:3] *= -1
    w2cs = np.linalg.inv(c2ws)
    return [Camera.from_kw2c("MovingCam", w, h, k, w2c) for w2c in w2cs]


def get_extra_attr(chair: dict, chair_color, sand_xyz):
    """Extra-gaussian packs for the demo rasterizer path
    (demo_utils.py:59-85).  Returns attribute tuples
    (xyz, color, opacity, scale, rotation)."""
    n = sand_xyz.shape[0]
    lo = sand_xyz.min(axis=0, keepdims=True)
    hi = sand_xyz.max(axis=0, keepdims=True)
    sand_color = (sand_xyz - lo) / jnp.maximum(hi - lo, 1e-8) * 0.5 + 0.25
    sand_opacity = jnp.ones((n, 1), jnp.float32)
    sand_scale = 0.3 * 0.2 / 50 * jnp.ones((n, 3), jnp.float32)
    sand_rot = jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0)
    extra_all = (jnp.concatenate([sand_xyz, chair["xyz"]], 0),
                 jnp.concatenate([sand_color, chair_color], 0),
                 jnp.concatenate([sand_opacity, chair["opacity"]], 0),
                 jnp.concatenate([sand_scale, chair["scale"]], 0),
                 jnp.concatenate([sand_rot, chair["rotation"]], 0))
    extra_chair = (chair["xyz"], chair_color, chair["opacity"],
                   chair["scale"], chair["rotation"])
    return extra_all, extra_chair, sand_color


def prune_faces_opacity(splats, prune_f_idx):
    """Silence gaussians bound to given faces (demo_utils.py:87-90)."""
    mask = jnp.isin(splats.binding, jnp.asarray(prune_f_idx))
    return dataclasses.replace(
        splats, opacity=jnp.where(mask[:, None], -100.0, splats.opacity))


def build_demo_sim(cloth_verts0, cloth_faces, sand_xyz, sand_vol,
                   collider_verts, collider_faces, tf: SimTransform,
                   grid_size=250, num_joint_v=0, num_joint_f=0,
                   mesh_friction=0.5, friction_angle=40.0,
                   density=1.0, E=200.0, nu=0.3, gamma=500.0, kappa=500.0,
                   column_k=96, mesh_column_k=32, column_c_cap=8192,
                   column_radius=1, rebin_auto=False):
    """Mixed cloth + sand simulation setup (run_demo.py:219-379):
    elements/vertices = garment, traditional = sand (Drucker-Prager),
    collider = SMPL-X + tracked human + chair, sticky floor at y=0.1."""
    cloth_verts0 = jnp.asarray(cloth_verts0)
    faces = np.asarray(cloth_faces, np.int32)
    sand_sim = tf.wld2sim(jnp.asarray(sand_xyz))
    sim_verts = tf.wld2sim(cloth_verts0)

    E_n, T_n, V_n = len(faces), len(sand_xyz), len(cloth_verts0)
    cfg = types.MPMStaticConfig(
        n_elements=E_n, n_traditional=T_n, n_vertices=V_n,
        n_grid=grid_size, grid_lim=2.0, material=2,  # sand for traditional
        num_joint_v=num_joint_v, num_joint_f=num_joint_f)

    d, r_inv, evol, vvol = types.cloth_geometry(sim_verts,
                                                jnp.asarray(faces))
    x = jnp.concatenate([sim_verts[faces].mean(1), sand_sim, sim_verts], 0)
    vol = jnp.concatenate([evol, jnp.asarray(sand_vol) * tf.scale ** 3,
                           vvol], 0)
    state = types.make_state(cfg, x, faces=faces, d=d, R_inv=r_inv, vol=vol)
    model = types.make_model(cfg.n_particles, E=E, nu=nu, gamma=gamma,
                             kappa=kappa, friction_angle=friction_angle)
    cfg, model, state = set_parameters_dict(cfg, model, state, {
        "material": "sand", "g": [0.0, -9.8, 0.0],
        "friction_angle": friction_angle})
    state = reset_density(state, density)

    solver = MPMSolver(cfg, column_k=column_k,
                       mesh_column_k=mesh_column_k,
                       column_c_cap=(column_c_cap or None),
                       column_radius=column_radius,
                       rebin_auto=rebin_auto and column_k > 0,
                       faces=faces)
    solver.add_surface_collider([0.0, 0.1, 0.0], [0.0, 1.0, 0.0])
    solver.add_mesh_collider(collider_faces, friction=mesh_friction)
    solver.add_particle_mover()
    # size the mesh-splat cap for THIS body at THIS grid (the fixed
    # 1024-row default overflows real bodies at the 250^3 demo grid);
    # callers animating the collider should re-calibrate with the pose
    # sequence (scripts/run_demo.py does)
    solver.calibrate_caps(mesh_xs=[np.asarray(tf.wld2sim(
        jnp.asarray(collider_verts)))], sample_every=1)
    return cfg, state, model, solver


def sand_release_schedule(solver, state, cfg, normal=(0.0, 0.0, 1.0),
                          start_position=0.0, end_position=1.0,
                          start_time=0.0, end_time=1.0, num_layers=50):
    """Gradual sand release via shrinking pin masks
    (run_demo.py:524, mpm_solver.py:1261-1287)."""
    solver.release_particles_sequentially(
        state, normal, start_position, end_position, start_time, end_time,
        num_layers=num_layers)


def render_demo_frame(avatar, params, verts, ao_map, cam, camera_idx,
                      sand_xyz=None, chair=None, chair_shs=None,
                      active_sh_degree: int = 3, tile_capacity: int = 512,
                      tile_capacity_lo: int = 64, hot_tiles: int = 1024):
    """One demo render frame with extra gaussians (run_demo.py:586-610):
    avatar (shadowed SH colors) + chair (SH toward the moving camera) +
    sand (position-colored), white background, color-calibrated."""
    import jax.numpy as jnp
    from ..render import (camera_arrays, convert_sh_colors, render)
    from ..render import gaussians as G
    from ..render.geometry import covariance_from_scaling_rotation
    from .appearance import shaded_colors

    frames = avatar.frames_for_verts(verts)
    ca = camera_arrays(cam)
    xyz = G.get_xyz(params.splats, frames)
    colors, _ = shaded_colors(avatar, params, frames, ao_map,
                              ca.cam_center, xyz, active_sh_degree)

    # sand and chair are INDEPENDENT overlays: the reference renders the
    # simulated sand unconditionally (run_demo.py:575-578,601) while the
    # chair gaussians are an optional asset
    packs = []
    if sand_xyz is not None:
        n = sand_xyz.shape[0]
        lo = sand_xyz.min(axis=0, keepdims=True)
        hi = sand_xyz.max(axis=0, keepdims=True)
        sand_color = ((sand_xyz - lo) / jnp.maximum(hi - lo, 1e-8)
                      * 0.5 + 0.25)
        sand_scale = 0.3 * 0.2 / 50 * jnp.ones((n, 3), jnp.float32)
        sand_rot = jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0)
        sand_cov = covariance_from_scaling_rotation(sand_scale, 1.0,
                                                    sand_rot)
        packs.append((sand_xyz, sand_color, jnp.ones((n,)), sand_cov))
    if chair is not None:
        chair_color = convert_sh_colors(chair_shs, chair["xyz"],
                                        ca.cam_center, active_sh_degree)
        chair_cov = covariance_from_scaling_rotation(
            chair["scale"], 1.0, chair["rotation"])
        packs.append((chair["xyz"], chair_color,
                      chair["opacity"].reshape(-1), chair_cov))
    extra = None
    if packs:
        extra = tuple(jnp.concatenate([p[i] for p in packs], 0)
                      for i in range(4))

    out = render(cam, params.splats, frames, bg_color=jnp.ones(3),
                 active_sh_degree=active_sh_degree, override_color=colors,
                 extra=extra, tile_capacity=tile_capacity,
                 tile_capacity_lo=tile_capacity_lo, hot_tiles=hot_tiles)
    rendering = out["render"] * jnp.exp(params.cam_m[camera_idx])[:, None, None] \
        + params.cam_c[camera_idx][:, None, None]
    rendering = rendering * out["mask"] + (1.0 - out["mask"])
    return jnp.clip(rendering, 0.0, 1.0), out


def prepare_pose_playback(smplx_model, first_params: dict,
                          pose_params: dict, first_frame_verts,
                          lbs_w=None, fps: float = 25.0, k: int = 10):
    """Animate the tracked avatar through a novel pose sequence
    (run_demo.py:176-214): inverse-LBS the first tracked frame to the
    canonical pose with the first frame's SMPL-X fit, then forward-LBS
    through every pose of the sequence (e.g. a1_sitting.npz).

    Returns dict(verts (T,V,3), verts_velo (T-1,V,3),
    smplx (T,Vs,3), smplx_velo (T-1,Vs,3))."""
    from ..avatar.pipeline import deform_tracked_to_poses, frame_velocities

    deformed, out_poses, _ = deform_tracked_to_poses(
        smplx_model, jnp.asarray(first_frame_verts), first_params,
        pose_params, lbs_w=lbs_w, k=k)
    smplx_seq = out_poses.vertices
    return {
        "verts": deformed,
        "verts_velo": frame_velocities(deformed, fps),
        "smplx": smplx_seq,
        "smplx_velo": frame_velocities(smplx_seq, fps),
    }


def load_chair_gaussians(path: str):
    """Chair gaussian pack for the orbit render (run_demo.py:575-578).

    Accepts an npz with {xyz, shs, opacity, scale, rotation} or a 3DGS
    checkpoint PLY.  Returns (chair_dict, chair_shs)."""
    if path.endswith(".npz"):
        d = dict(np.load(path))
        chair = {"xyz": jnp.asarray(d["xyz"]),
                 "opacity": jnp.asarray(d["opacity"]).reshape(-1, 1),
                 "scale": jnp.asarray(d["scale"]),
                 "rotation": jnp.asarray(d["rotation"])}
        shs = jnp.asarray(d["shs"])
    else:
        from ..utils.io import read_ply_gaussians
        d = read_ply_gaussians(path)
        chair = {"xyz": jnp.asarray(d["xyz"]),
                 "opacity": jax.nn.sigmoid(
                     jnp.asarray(d["opacity"]).reshape(-1, 1)),
                 "scale": jnp.exp(jnp.asarray(d["scaling"])),
                 "rotation": jnp.asarray(d["rotation"])}
        shs = jnp.concatenate([jnp.asarray(d["features_dc"]),
                               jnp.asarray(d["features_rest"])], axis=1)
    return chair, shs
