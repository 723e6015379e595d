"""Stage-1 mesh tracking smoke test with synthetic views."""

import numpy as np
import pytest
import jax.numpy as jnp

from test_substep_golden import make_cloth
from test_rasterizer import simple_camera


@pytest.mark.slow
def test_tracker_fits_colors_and_runs():
    from mpmavatar_tpu.train.tracking import MeshTracker, TrackingConfig

    verts, faces = make_cloth(nx=6, ny=6, y0=0.0, extent=0.8)
    verts = verts - np.array([1.0, 0.0, 1.0])  # center at origin
    cfg = TrackingConfig(iters_first=30, iters_rest=10, tile_capacity=128,
                         collision_weight=0.0)
    tracker = MeshTracker(verts, faces, cfg, max_cams=2)

    cam = simple_camera(w=64, h=64, f=40.0, cam_z=-2.0)
    gt = np.full((3, 64, 64), 0.4, np.float32)
    msk = np.ones((1, 64, 64), np.float32)
    batches = [{"cam": cam, "camera_idx": 0, "rgb": gt, "msk": msk}]
    smplx_v = np.zeros((8, 3), np.float32) + 5.0  # far away body
    smplx_vn = np.zeros((8, 3), np.float32)
    smplx_vn[:, 1] = 1.0

    losses = tracker.fit_frame(batches, smplx_v, smplx_vn,
                               is_initial=True)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    # second frame with warm start
    tracker.initialize_per_timestep()
    losses2 = tracker.fit_frame(batches, smplx_v, smplx_vn,
                                is_initial=False)
    assert np.isfinite(losses2).all()


def test_tracker_save_roundtrip(tmp_path):
    from mpmavatar_tpu.train.tracking import MeshTracker, TrackingConfig
    verts, faces = make_cloth(nx=4, ny=4)
    tracker = MeshTracker(verts, faces, TrackingConfig(tile_capacity=64),
                          max_cams=1)
    tracker.save_frame(tmp_path / "params_0.npz", 0)
    data = np.load(tmp_path / "params_0.npz")
    assert data["vertices"].shape == verts.shape
    assert data["faces"].shape == faces.shape


def test_repose_human_matches_direct_lbs(tmp_path):
    """Inter-frame LBS re-posing: human verts tracked at pose0 must land
    on the rig's pose1 surface (train_mesh_lbs_actorshq.py:495-519)."""
    import jax.numpy as jnp
    from mpmavatar_tpu.avatar.smplx import make_test_rig, smplx_forward
    from mpmavatar_tpu.train.tracking import MeshTracker

    rig = make_test_rig(n_joints=4, n_verts=64)
    pose0 = {"body_pose": jnp.zeros((1, 9)), "trans": jnp.zeros((1, 3))}
    p1 = np.zeros((1, 9), np.float32)
    p1[0, 0] = 0.4
    pose1 = {"body_pose": jnp.asarray(p1), "trans": jnp.zeros((1, 3))}
    v0 = np.asarray(smplx_forward(rig, pose0).vertices[0])
    v1 = np.asarray(smplx_forward(rig, pose1).vertices[0])

    # tracked mesh = rig surface at pose0; first 10 verts are "cloth"
    faces = np.asarray(rig.faces)
    cloth_idx = np.arange(10)
    tracker = MeshTracker(v0, faces, cloth_v_idx=cloth_idx,
                          smplx_model=rig,
                          smplx_faces=faces)
    tracker.repose_human(pose0, pose1)
    out = np.asarray(tracker.params["vertices"])
    human = np.setdiff1d(np.arange(64), cloth_idx)
    # human layer re-posed onto pose1; cloth untouched
    np.testing.assert_allclose(out[human], v1[human], atol=2e-2)
    np.testing.assert_allclose(out[cloth_idx], v0[cloth_idx], atol=1e-6)


@pytest.mark.slow
def test_joint_smplx_fit_reduces_collision(tmp_path):
    """Joint SMPL-X optimization: with the body interpenetrating the
    tracked cloth, the trainable pose must move to reduce the collision
    penalty (the mesh params stay optimizable too)."""
    import jax.numpy as jnp
    from mpmavatar_tpu.avatar.smplx import make_test_rig, smplx_forward
    from mpmavatar_tpu.train.tracking import MeshTracker, TrackingConfig
    from test_rasterizer import simple_camera
    from mpmavatar_tpu.utils.losses import collision_loss
    from mpmavatar_tpu.render.geometry import vertex_normals

    rig = make_test_rig(n_joints=4, n_verts=64)
    faces = np.asarray(rig.faces)
    pose = {"body_pose": jnp.zeros((1, 9)), "trans": jnp.zeros((1, 3))}
    body_v = np.asarray(smplx_forward(rig, pose).vertices[0])
    # cloth = body surface pushed slightly INSIDE along the normal
    vn = np.asarray(vertex_normals(jnp.asarray(body_v),
                                   jnp.asarray(faces)))
    cloth_v = body_v - 0.02 * vn
    cfg = TrackingConfig(collision_weight=100.0, iters_first=30,
                         tile_capacity=64)
    tracker = MeshTracker(cloth_v, faces, cfg,
                          cloth_v_idx=np.arange(64), smplx_model=rig,
                          smplx_faces=faces, lr_smplx=5e-3)
    tracker.set_smplx_frame(pose, is_initial=True)

    cam = simple_camera(w=32, h=32, f=20.0, cam_z=-3.0)
    rng = np.random.default_rng(0)
    batches = [{"cam": cam, "camera_idx": 0,
                "rgb": rng.random((3, 32, 32)).astype(np.float32),
                "msk": np.ones((1, 32, 32), np.float32)}]

    def coll_now():
        sv, svn = tracker._smplx_geometry(
            tracker.smplx_train, tracker.smplx_fixed, rig, None)
        return float(collision_loss(
            tracker.params["vertices"], sv, svn))

    before = coll_now()
    tracker.fit_frame(batches, is_initial=True)
    after = coll_now()
    fitted = tracker.finish_smplx_frame(True)
    assert after < before, (before, after)
    # the trainable pose actually moved
    assert float(jnp.abs(fitted["body_pose"]).max()) > 1e-5


def test_tracker_resume_roundtrip(tmp_path):
    from mpmavatar_tpu.train.tracking import MeshTracker
    from test_substep_golden import make_cloth
    verts, faces = make_cloth(nx=5, ny=5)
    tr = MeshTracker(verts, faces)
    tr.save_frame(str(tmp_path / "params_0.npz"), 0)
    moved = {**tr.params, "vertices": tr.params["vertices"] + 0.05}
    tr.params = moved
    tr.save_frame(str(tmp_path / "params_3.npz"), 3)

    tr2 = MeshTracker(verts, faces)
    tr2.resume(str(tmp_path), 0, 3)
    np.testing.assert_allclose(np.asarray(tr2.params["vertices"]),
                               np.asarray(moved["vertices"]), atol=1e-6)
    assert len(tr2.prev_verts) == 1
