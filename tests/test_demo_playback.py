"""Demo pose playback: LBS re-posing + animated collider in the sim loop
(run_demo.py:176-214,514-548 parity)."""

import pytest
import numpy as np
import jax.numpy as jnp

from mpmavatar_tpu.avatar.smplx import make_test_rig
from mpmavatar_tpu.train.demo import prepare_pose_playback


def _playback(n_poses=4):
    rig = make_test_rig(n_joints=4, n_verts=64)
    verts = np.asarray(rig.v_template) + np.asarray([0.0, 0.0, 0.05],
                                                    np.float32)
    first = {"body_pose": jnp.zeros((1, 9)), "trans": jnp.zeros((1, 3))}
    pose = np.zeros((n_poses, 9), np.float32)
    pose[:, 0] = np.linspace(0, 0.4, n_poses)
    poses = {"body_pose": jnp.asarray(pose),
             "trans": jnp.zeros((n_poses, 3))}
    return rig, verts, prepare_pose_playback(rig, first, poses, verts,
                                             k=4)


def test_playback_roundtrip_and_motion():
    _, verts, pb = _playback()
    # frame 0 re-poses to the identity pose -> recovers the input mesh
    np.testing.assert_allclose(np.asarray(pb["verts"][0]), verts,
                               atol=1e-4)
    # later poses actually move
    assert float(jnp.abs(pb["verts"][-1] - pb["verts"][0]).max()) > 0.01
    # velocities are consistent frame diffs x fps
    np.testing.assert_allclose(
        np.asarray(pb["verts_velo"][0]),
        np.asarray((pb["verts"][1] - pb["verts"][0]) * 25.0), atol=1e-5)


def test_demo_sand_renders_without_chair(tmp_path):
    """Simulated sand must appear in the demo render even when no chair
    gaussians are supplied (reference renders sand unconditionally,
    run_demo.py:575-601; the round-2 port dropped it when chair=None)."""
    from test_train import make_fake_tracking_assets
    from test_rasterizer import simple_camera
    from mpmavatar_tpu.render.avatar_model import load_mesh_avatar
    from mpmavatar_tpu.train.demo import render_demo_frame

    verts, faces = make_fake_tracking_assets(tmp_path)
    avatar, params = load_mesh_avatar(str(tmp_path),
                                      str(tmp_path / "uv.obj"),
                                      sh_degree=1, capacity_factor=2.0)
    cam = simple_camera(w=64, h=64, f=40.0, cam_z=-2.0)
    v = avatar.select_verts(params, 0) - jnp.asarray([1.0, 1.0, 1.0])
    ao = jnp.asarray(avatar.ao_maps[0])

    # sand cloud in front of the cloth, visible to the camera
    rng = np.random.default_rng(3)
    sand = jnp.asarray(rng.uniform(-0.2, 0.2, (200, 3)).astype(np.float32)
                       + np.asarray([0.0, 0.0, -0.3], np.float32))

    img_plain, _ = render_demo_frame(avatar, params, v, ao, cam, 0,
                                     sand_xyz=None, chair=None,
                                     tile_capacity=128)
    img_sand, _ = render_demo_frame(avatar, params, v, ao, cam, 0,
                                    sand_xyz=sand, chair=None,
                                    tile_capacity=128)
    assert np.isfinite(np.asarray(img_sand)).all()
    assert float(jnp.abs(img_sand - img_plain).max()) > 0.01


@pytest.mark.slow
def test_animated_collider_drives_cloth():
    """A moving body under the cloth must change the outcome vs a static
    one (the round-1 demo simulated against a frozen collider)."""
    from test_substep_golden import make_cloth, build_pair
    from mpmavatar_tpu.sim import MPMSolver
    from bench import build_body_sphere

    verts, faces = make_cloth(nx=9, ny=9, y0=1.05, extent=0.4)
    _, cfg, state, model = build_pair(verts, faces, E=300.0, n_grid=48)
    bv, bf = build_body_sphere(n_theta=10, n_phi=10,
                               center=(1.0, 0.85, 1.0), r=0.18)
    bv = jnp.asarray(bv)

    def run(moving):
        s = MPMSolver(cfg, column_k=16, mesh_column_k=16,
                      column_c_cap=512, faces=faces)
        s.add_mesh_collider(bf, friction=0.5)
        st, t = state, 0.0
        vel = jnp.asarray([0.5, 0.0, 0.0]) if moving else jnp.zeros(3)
        mesh_x = bv
        for i in range(3):
            mesh_v = jnp.broadcast_to(vel, bv.shape)
            st, t = s.frame(st, model, 2e-4, 10, t, mesh_x=mesh_x,
                            mesh_v=mesh_v)
            mesh_x = mesh_x + mesh_v * (10 * 2e-4)
        return np.asarray(st.x)

    x_static = run(False)
    x_moving = run(True)
    assert np.isfinite(x_moving).all()
    assert np.abs(x_moving - x_static).max() > 1e-5
