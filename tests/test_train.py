"""Trainer smoke tests with synthetic assets."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from test_substep_golden import make_cloth


def make_fake_tracking_assets(tmp_path, n_frames=2, nx=5, ny=5):
    """Synthesize the tracking stage's outputs: params_*.npz + AO maps +
    UV obj (mesh_gaussian_model.py:30-111 inputs)."""
    from PIL import Image
    verts, faces = make_cloth(nx=nx, ny=ny, y0=1.0, extent=0.5)
    os.makedirs(tmp_path / "aomap", exist_ok=True)
    rng = np.random.default_rng(0)
    for t in range(n_frames):
        np.savez(tmp_path / f"params_{t}.npz",
                 vertices=verts + 0.01 * t,
                 faces=faces,
                 rgb_colors=rng.random((len(faces), 3)).astype(np.float32),
                 cam_m=np.zeros((4, 3), np.float32),
                 cam_c=np.zeros((4, 3), np.float32))
        Image.fromarray((rng.random((64, 64)) * 255).astype(np.uint8)).save(
            tmp_path / "aomap" / f"mesh_cloth_{t}.png")
    # UV template obj
    with open(tmp_path / "uv.obj", "w") as f:
        for v in verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for i in range(len(verts)):
            f.write(f"vt {rng.random():.4f} {rng.random():.4f}\n")
        for fc in faces:
            f.write(f"f {fc[0]+1}/{fc[0]+1} {fc[1]+1}/{fc[1]+1} "
                    f"{fc[2]+1}/{fc[2]+1}\n")
    return verts, faces


def test_avatar_load_and_render(tmp_path):
    from mpmavatar_tpu.render.avatar_model import (load_mesh_avatar,
                                                   save_avatar_checkpoint,
                                                   load_avatar_checkpoint)
    from mpmavatar_tpu.train.appearance import render_avatar_frame
    from test_rasterizer import simple_camera

    verts, faces = make_fake_tracking_assets(tmp_path)
    avatar, params = load_mesh_avatar(str(tmp_path), str(tmp_path / "uv.obj"),
                                      sh_degree=1, capacity_factor=2.0)
    assert avatar.num_timesteps == 2
    assert params.splats.capacity == 2 * len(faces)

    cam = simple_camera(w=64, h=64, f=40.0, cam_z=-2.0)
    v = avatar.select_verts(params, 0)
    # move cloth to origin-ish for the test camera
    v = v - jnp.asarray([1.0, 1.0, 1.0])
    img, out = render_avatar_frame(
        avatar, params, v, jnp.asarray(avatar.ao_maps[0]), cam, 0,
        active_sh_degree=0, bg=jnp.zeros(3), white_bkgd=False,
        tile_capacity=128)
    assert np.isfinite(np.asarray(img)).all()
    assert np.asarray(out["alpha"]).max() > 0.01

    # checkpoint roundtrip
    save_avatar_checkpoint(str(tmp_path / "ckpt"), params, avatar)
    params2 = load_avatar_checkpoint(str(tmp_path / "ckpt"), params)
    np.testing.assert_allclose(np.asarray(params2.cam_m),
                               np.asarray(params.cam_m))
    alive = np.asarray(params.splats.alive)
    np.testing.assert_allclose(
        np.asarray(params2.splats.features_dc)[alive],
        np.asarray(params.splats.features_dc)[alive], atol=1e-6)


def test_appearance_step_reduces_loss(tmp_path):
    from mpmavatar_tpu.render.avatar_model import load_mesh_avatar
    from mpmavatar_tpu.train.appearance import (make_optimizer,
                                                make_train_step)
    from mpmavatar_tpu.data.config import OptimizationParams
    from test_rasterizer import simple_camera

    verts, faces = make_fake_tracking_assets(tmp_path)
    avatar, params = load_mesh_avatar(str(tmp_path), str(tmp_path / "uv.obj"),
                                      sh_degree=1, capacity_factor=1.0)
    # recenter mesh at origin for the test camera
    avatar.verts_orig = avatar.verts_orig - np.array([1.0, 1.0, 1.0])

    opt = OptimizationParams()
    tx = make_optimizer(opt, spatial_lr_scale=1.0)
    opt_state = tx.init(params)
    step = make_train_step(avatar, opt, tx, active_sh_degree=0,
                           white_bkgd=False, tile_capacity=128)

    from mpmavatar_tpu.render import camera_arrays
    cam = simple_camera(w=64, h=64, f=40.0, cam_z=-2.0)
    ca = camera_arrays(cam)
    gt = np.full((3, 64, 64), 0.5, np.float32)
    msk = np.ones((1, 64, 64), np.float32)
    losses = []
    for it in range(8):
        params, opt_state, loss, aux = step(
            params, opt_state, 0, 0, ca, jnp.asarray(gt),
            jnp.asarray(msk), jnp.asarray(avatar.ao_maps[0]), 64, 64)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_material_trainer_autodiff_step():
    from mpmavatar_tpu.train.material import (MaterialTrainer,
                                              MaterialTrainerConfig)
    verts, faces = make_cloth(nx=5, ny=5, y0=1.0, extent=0.4)
    n_frames = 2
    # synthetic "tracked" trajectory: cloth slowly falling
    train_verts = np.stack([verts - [0, 0.001 * i, 0]
                            for i in range(n_frames + 1)])
    body = np.array([[0.6, 0.9, 0.6], [1.4, 0.9, 0.6], [1.4, 0.9, 1.4],
                     [0.6, 0.9, 1.4]], np.float32)
    body_f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    smplx_verts = np.stack([body] * (n_frames + 1))

    cfg = MaterialTrainerConfig(grid_size=32, substep=6, iterations=3)
    trainer = MaterialTrainer(cfg, faces, verts, train_verts, smplx_verts,
                              body_f, num_joint_v=4, num_joint_f=2)
    loss0, p0 = trainer.train_one_step()
    loss1, p1 = trainer.train_one_step()
    assert np.isfinite([loss0, loss1]).all()
    # parameters moved
    assert any(abs(p1[k] - cfg.init_D if k == "D" else 0) >= 0
               for k in p1)
    # finite-difference mode also runs
    loss_fd, _ = trainer.train_one_step_finite_diff()
    assert np.isfinite(loss_fd)


@pytest.mark.slow
def test_demo_sim_mixed_sand_cloth():
    from mpmavatar_tpu.train.demo import build_demo_sim, get_sand
    from mpmavatar_tpu.sim import SimTransform
    verts, faces = make_cloth(nx=4, ny=4, y0=1.2, extent=0.4)
    sand, sand_vol = get_sand(center=(0.9, 1.5, 0.9),
                              length=(0.2, 0.04, 0.1), res=(8, 2, 4))
    body = np.array([[0.7, 0.9, 0.7], [1.3, 0.9, 0.7], [1.3, 0.9, 1.3],
                     [0.7, 0.9, 1.3]], np.float32)
    body_f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    tf = SimTransform.from_verts(verts)
    cfg, state, model, solver = build_demo_sim(
        verts, faces, sand, sand_vol, body, body_f, tf, grid_size=32)
    assert cfg.n_traditional == len(sand)
    assert cfg.material == 2
    state, _ = solver.frame(state, model, 1e-4, 10, 0.0,
                            mesh_x=tf.wld2sim(jnp.asarray(body)),
                            mesh_v=jnp.zeros((4, 3)))
    assert np.isfinite(np.asarray(state.x)).all()
    # sand fell
    sand_y = np.asarray(state.x)[cfg.n_elements:cfg.n_elements
                                 + cfg.n_traditional, 1]
    sim_sand_y0 = np.asarray(tf.wld2sim(jnp.asarray(sand)))[:, 1]
    assert sand_y.mean() < sim_sand_y0.mean()


@pytest.mark.slow
def test_material_trainer_simulate_rollout():
    from mpmavatar_tpu.train.material import (MaterialTrainer,
                                              MaterialTrainerConfig)
    verts, faces = make_cloth(nx=4, ny=4, y0=1.0, extent=0.4)
    n_frames = 2
    train_verts = np.stack([verts] * (n_frames + 1))
    body = np.array([[0.6, 0.9, 0.6], [1.4, 0.9, 0.6], [1.4, 0.9, 1.4],
                     [0.6, 0.9, 1.4]], np.float32)
    body_f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    smplx_verts = np.stack([body] * (n_frames + 1))

    cfg = MaterialTrainerConfig(grid_size=32, substep=5, iterations=1)
    trainer = MaterialTrainer(cfg, faces, verts, train_verts, smplx_verts,
                              body_f, num_joint_v=0, num_joint_f=0)
    frames = trainer.simulate(
        verts, np.zeros_like(verts), smplx_verts[:-1],
        (smplx_verts[1:] - smplx_verts[:-1]) * 25.0, n_frames=2)
    assert len(frames) == 2
    for f in frames:
        assert f.shape == verts.shape
        assert np.isfinite(f).all()
    # cloth fell a little under gravity
    assert frames[-1][:, 1].mean() < verts[:, 1].mean()


def test_merge_layered_meshes():
    from mpmavatar_tpu.train.evaluate import merge_layered_meshes
    lower = np.zeros((10, 3))
    upper = np.ones((10, 3))
    idx = np.array([1, 3, 5])
    merged = merge_layered_meshes(lower, upper, idx)
    assert np.all(merged[idx] == 1.0)
    mask = np.ones(10, bool)
    mask[idx] = False
    assert np.all(merged[mask] == 0.0)
