"""Layered-garment two-pass flow: sim upper + sim lower -> merge ->
metrics (VERDICT r3 item 5).

Mirrors the reference's 4D-DRESS layered experiments: two independent
physics passes over different garment splits of the SAME full tracked
mesh (/root/reference/scripts/physics/4ddress_s170_{upper,lower}.sh),
each writing full uvmesh/*.obj frames, merged per-frame by overwriting
the lower pass's vertices at the upper garment's indices
(/root/reference/merge_meshes.py:13-44)."""

import os
import sys

import numpy as np
import pytest

from test_substep_golden import make_cloth

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "scripts"))


def _simulate_garment(verts, faces, n_frames=2):
    """One physics pass on one garment (MaterialTrainer.simulate)."""
    from mpmavatar_tpu.train.material import (MaterialTrainer,
                                              MaterialTrainerConfig)
    body = np.array([[0.6, 0.85, 0.6], [1.4, 0.85, 0.6],
                     [1.4, 0.85, 1.4], [0.6, 0.85, 1.4]], np.float32)
    body_f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    smplx_verts = np.stack([body] * (n_frames + 1))
    train_verts = np.stack([verts] * (n_frames + 1))
    cfg = MaterialTrainerConfig(grid_size=32, substep=5, iterations=1)
    tr = MaterialTrainer(cfg, faces, verts, train_verts, smplx_verts,
                         body_f, num_joint_v=0, num_joint_f=0)
    return tr.simulate(verts, np.zeros_like(verts), smplx_verts[:-1],
                       (smplx_verts[1:] - smplx_verts[:-1]) * 25.0,
                       n_frames=n_frames)


def test_layered_two_pass_sim_merge_metrics(tmp_path):
    from mpmavatar_tpu.train.evaluate import geometry_metrics
    from mpmavatar_tpu.utils.io import read_obj, write_obj
    import merge_meshes as mm

    # full "tracked" mesh = upper garment + lower garment, offset layers
    uv_verts, uv_faces = make_cloth(nx=5, ny=5, y0=1.1, extent=0.4)
    lv_verts, lv_faces = make_cloth(nx=5, ny=5, y0=1.0, extent=0.4)
    n_u = len(uv_verts)
    full_faces = np.concatenate([uv_faces, lv_faces + n_u])
    upper_idx = np.arange(n_u)                       # upper split
    lower_idx = np.arange(n_u, n_u + len(lv_verts))  # lower split

    n_frames = 2
    sim_u = _simulate_garment(uv_verts, uv_faces, n_frames)
    sim_l = _simulate_garment(lv_verts, lv_faces, n_frames)
    assert all(np.isfinite(f).all() for f in sim_u + sim_l)
    # both garments actually moved (fell under gravity)
    assert sim_u[-1][:, 1].mean() < uv_verts[:, 1].mean()
    assert sim_l[-1][:, 1].mean() < lv_verts[:, 1].mean()

    # each pass writes FULL meshes: own sim verts at own split, tracked
    # verts elsewhere (the layered-capture path of scripts/train_material)
    out = str(tmp_path)
    for seq_dir, sims, own_idx, other_v, other_idx in (
            ("s_upper", sim_u, upper_idx, lv_verts, lower_idx),
            ("s_lower", sim_l, lower_idx, uv_verts, upper_idx)):
        d = os.path.join(out, seq_dir, "uvmesh")
        os.makedirs(d)
        for i, v in enumerate(sims):
            full = np.zeros((n_u + len(lv_verts), 3), np.float32)
            full[own_idx] = v
            full[other_idx] = other_v
            write_obj(os.path.join(d, f"{i:03d}.obj"), full, full_faces)

    # the merge CLI (reference merge_meshes.py parity)
    split_path = str(tmp_path / "split_idx_upper.npz")
    np.savez(split_path, reordered_cloth_v_idx=upper_idx)
    mm.main(["--seq", "s", "--output_dir", out,
             "--split_idx_upper", split_path])

    merged_dir = os.path.join(out, "s", "uvmesh")
    frames = sorted(os.listdir(merged_dir))
    assert len(frames) == n_frames
    for i, fn in enumerate(frames):
        mv, mf = read_obj(os.path.join(merged_dir, fn))
        np.testing.assert_array_equal(mf, full_faces)
        # upper verts = upper pass sim; lower verts = lower pass sim
        np.testing.assert_allclose(mv[upper_idx], sim_u[i], atol=1e-5)
        np.testing.assert_allclose(mv[lower_idx], sim_l[i], atol=1e-5)

    # metrics close the loop: merged mesh vs the tracked full mesh
    gt_full = np.concatenate([uv_verts, lv_verts])
    m = geometry_metrics(mv, full_faces, gt_full, full_faces,
                         sample_count=2000)
    assert np.isfinite(m["CD"]) and np.isfinite(m["F-Score"])
    assert m["CD"] < 100.0  # x1000 scale; a short fall stays close


def test_layered_configs_load():
    """The shipped upper/lower configs parse into ModelParams with the
    right splits (scripts/physics/4ddress_s170_*.sh parity)."""
    from mpmavatar_tpu.data import ModelParams, load_config
    root = os.path.join(os.path.dirname(__file__), "..", "scripts",
                        "configs")
    up = load_config(os.path.join(root, "dress4d_00170_upper.json"),
                     ModelParams)
    lo = load_config(os.path.join(root, "dress4d_00170_lower.json"),
                     ModelParams)
    assert up.split_idx_path.endswith("split_idx_upper.npz")
    assert lo.split_idx_path.endswith("split_idx_lower.npz")
    assert up.train_frame_start_num == [21, 12]
    assert lo.train_frame_start_num == [60, 12]
    assert up.output_dir != lo.output_dir
