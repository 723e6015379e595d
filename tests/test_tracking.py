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
