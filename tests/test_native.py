"""Native C++ component tests (OBJ parser, KD-tree KNN)."""

import numpy as np
import pytest

from mpmavatar_tpu.native import fast_obj, knn
from mpmavatar_tpu.utils.io import write_obj, read_obj


def test_fast_obj_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    verts = rng.normal(size=(37, 3)).astype(np.float32)
    faces = rng.integers(0, 37, (20, 3)).astype(np.int32)
    p = tmp_path / "m.obj"
    write_obj(str(p), verts, faces)
    v2, f2 = fast_obj.read_obj(str(p))
    np.testing.assert_allclose(v2, verts, atol=1e-5)
    np.testing.assert_array_equal(f2, faces)
    # and through the io facade with fallback parity
    v3, f3 = read_obj(str(p))
    np.testing.assert_allclose(v3, verts, atol=1e-5)


def test_fast_obj_with_uv_faces(tmp_path):
    p = tmp_path / "uv.obj"
    with open(p, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 0 1 0\n")
        f.write("vt 0.1 0.2\nvt 0.3 0.4\nvt 0.5 0.6\n")
        f.write("f 1/1 2/2 3/3\n")
    v, fc = fast_obj.read_obj(str(p))
    assert v.shape == (3, 3)
    np.testing.assert_array_equal(fc, [[0, 1, 2]])


def test_knn_matches_bruteforce():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    q = rng.normal(size=(64, 3)).astype(np.float32)
    d2, idx = knn.query(pts, q, 5)
    brute = np.sum((q[:, None] - pts[None]) ** 2, -1)
    bidx = np.argsort(brute, axis=1)[:, :5]
    bd2 = np.take_along_axis(brute, bidx, 1)
    np.testing.assert_allclose(np.sort(d2, 1), np.sort(bd2, 1), rtol=1e-4)


def test_mean_dist2_3nn():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    out = knn.mean_dist2_3nn(pts)
    brute = np.sum((pts[:, None] - pts[None]) ** 2, -1)
    np.fill_diagonal(brute, np.inf)
    expect = np.sort(brute, 1)[:, :3].mean(1)
    np.testing.assert_allclose(out, expect, rtol=1e-4)
