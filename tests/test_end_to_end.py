"""End-to-end miniature pipeline: synthetic tracking assets -> material
training step (autodiff) -> test-pose simulation -> shadowed render ->
metrics.  Exercises the full reference workflow surface
(SURVEY.md §1 stages 2-5) on tiny shapes."""

import numpy as np
import pytest
import jax.numpy as jnp

from test_substep_golden import make_cloth
from test_rasterizer import simple_camera
from test_train import make_fake_tracking_assets


@pytest.mark.slow
def test_full_pipeline(tmp_path):
    from mpmavatar_tpu.render.avatar_model import load_mesh_avatar
    from mpmavatar_tpu.train.material import (MaterialTrainer,
                                              MaterialTrainerConfig)
    from mpmavatar_tpu.train.appearance import render_avatar_frame
    from mpmavatar_tpu.utils.metrics import all_mesh_metrics
    from mpmavatar_tpu.train.evaluate import appearance_metrics

    # stage 1 artifact: tracking assets on disk
    verts, faces = make_fake_tracking_assets(tmp_path, n_frames=3)
    avatar, params = load_mesh_avatar(str(tmp_path), str(tmp_path / "uv.obj"),
                                      sh_degree=1, capacity_factor=1.0)

    # stage 3: one autodiff material step against the tracked trajectory
    train_verts = avatar.verts_orig
    body = np.array([[0.6, 0.9, 0.6], [1.4, 0.9, 0.6], [1.4, 0.9, 1.4],
                     [0.6, 0.9, 1.4]], np.float32)
    body_f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    smplx_seq = np.stack([body] * len(train_verts))
    cfg = MaterialTrainerConfig(grid_size=32, substep=4, iterations=1)
    trainer = MaterialTrainer(cfg, faces, train_verts[0], train_verts,
                              smplx_seq, body_f, num_joint_v=2,
                              num_joint_f=1)
    loss, p = trainer.train_one_step()
    assert np.isfinite(loss)

    # stage 4: simulate test poses with the optimized parameters
    sim_frames = trainer.simulate(
        train_verts[0], np.zeros_like(train_verts[0]), smplx_seq[:-1],
        (smplx_seq[1:] - smplx_seq[:-1]) * 25.0, n_frames=2)
    assert all(np.isfinite(f).all() for f in sim_frames)

    # geometry metrics vs the "tracked" ground truth
    m = all_mesh_metrics(sim_frames[-1], faces, train_verts[-1], faces,
                         sample_count=2000)
    assert np.isfinite(m[0]) and np.isfinite(m[1])

    # stage 4 render: pose the avatar on the simulated mesh + shadow
    cam = simple_camera(w=64, h=64, f=40.0, cam_z=-2.0)
    sim_v = jnp.asarray(sim_frames[-1]) - jnp.asarray([1.0, 1.0, 1.0])
    img, out = render_avatar_frame(
        avatar, params, sim_v, jnp.asarray(avatar.ao_maps[0]), cam, 0,
        active_sh_degree=0, bg=jnp.zeros(3), white_bkgd=False,
        tile_capacity=128)
    assert np.isfinite(np.asarray(img)).all()

    # stage 5: appearance metrics of the render vs itself (sanity: PSNR
    # of identical images is large)
    gt = np.asarray(jnp.clip(img, 0, 1))
    mask = np.ones((64, 64), np.float32)
    m2 = appearance_metrics(gt, gt, mask)
    assert m2["PSNR"] > 50
    assert m2["SSIM"] > 0.99
