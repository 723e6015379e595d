"""Preview renderer, mesh cleaning, misc utils."""

import numpy as np

from test_rasterizer import simple_camera


def test_mesh_preview_renders():
    from mpmavatar_tpu.utils.mesh_preview import render_mesh
    verts = np.array([[-0.5, -0.5, 0], [0.5, -0.5, 0], [0.0, 0.5, 0],
                      [0.0, -0.8, 0.3]], np.float64)
    faces = np.array([[0, 1, 2], [0, 1, 3]])
    cam = simple_camera(w=48, h=48, f=30.0, cam_z=-2.0)
    img = render_mesh(verts, faces, cam)
    assert img.shape == (48, 48, 3)
    assert (img[:, :, 0] < 250).mean() > 0.02   # visible
    # nearer triangle (z=0) occludes the z=0.3 one at overlap: center px is
    # brighter-shaded foreground, no crash on overlap
    assert np.isfinite(img).all()


def test_clean_mesh():
    from mpmavatar_tpu.preprocess.mesh_cleaning import clean_mesh
    verts = np.random.rand(10, 3)
    faces = np.array([[0, 1, 2], [3, 4, 5], [6, 7, 8]])
    rgb = np.array([[0.5, 0.5, 0.5], [0.0, 0.0, 0.0], [0.2, 0.9, 0.1]])
    v2, f2, keep, remap = clean_mesh(verts, faces, rgb)
    assert keep.tolist() == [True, False, True]
    assert len(v2) == 6 and f2.max() == 5
    np.testing.assert_allclose(v2[f2[0]], verts[faces[0]])


def test_run_subprocess_and_seed():
    from mpmavatar_tpu.utils.misc import run_subprocess
    rc = run_subprocess(["true"], label="t")
    assert rc == 0
