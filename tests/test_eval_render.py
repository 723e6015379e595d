"""Stage-4 eval render chain: simulated meshes -> AO -> pred/gt pngs.

Exercises train.evaluate.render_eval_sequence end-to-end on synthetic
assets — the piece scripts/eval.py consumes
(train_material_params.py:828-881 parity)."""

import os

import numpy as np
import jax.numpy as jnp

from test_data import _make_actorshq_layout
from test_train import make_fake_tracking_assets


def test_render_eval_sequence(tmp_path):
    from mpmavatar_tpu.data import ModelParams, Scene
    from mpmavatar_tpu.render.avatar_model import load_mesh_avatar
    from mpmavatar_tpu.train.evaluate import render_eval_sequence
    from mpmavatar_tpu.utils.io import write_obj

    _make_actorshq_layout(str(tmp_path))
    verts, faces = make_fake_tracking_assets(tmp_path)
    avatar, params = load_mesh_avatar(str(tmp_path),
                                      str(tmp_path / "uv.obj"),
                                      sh_degree=1, capacity_factor=2.0)
    cfg = ModelParams(dataset_dir=str(tmp_path),
                      train_frame_start_num=[0, 2],
                      test_frame_start_num=[0, 2],
                      test_camera_index=[0, 1])
    scene = Scene(cfg)

    mesh_dir = tmp_path / "uvmesh"
    os.makedirs(mesh_dir, exist_ok=True)
    for i in range(2):
        write_obj(str(mesh_dir / f"{i:03d}.obj"), verts + 0.01 * i, faces)

    out_dir = str(tmp_path / "evalout")
    render_eval_sequence(avatar, params, scene, str(mesh_dir), out_dir,
                         str(tmp_path / "uv.obj"), active_sh_degree=0,
                         skip_video=True, ao_resolution=64,
                         tile_capacity=64)

    # the tree scripts/eval.py expects
    from PIL import Image
    assert sorted(os.listdir(os.path.join(out_dir, "aomap"))) == \
        ["0000.png", "0001.png"]
    for cam in ("Cam000", "Cam001"):
        for kind in ("pred", "gt"):
            d = os.path.join(out_dir, cam, kind)
            names = sorted(os.listdir(d))
            assert names == ["0000.png", "0001.png"], (cam, kind, names)
            img = np.asarray(Image.open(os.path.join(d, names[0])))
            assert img.shape == (24, 32, 3)

    # metrics run on the produced pairs (eval.py flow)
    from mpmavatar_tpu.train.evaluate import appearance_metrics
    pred = np.asarray(Image.open(os.path.join(
        out_dir, "Cam000", "pred", "0000.png")),
        np.float32).transpose(2, 0, 1) / 255.0
    gt = np.asarray(Image.open(os.path.join(
        out_dir, "Cam000", "gt", "0000.png")),
        np.float32).transpose(2, 0, 1) / 255.0
    m = appearance_metrics(pred, gt, np.ones((24, 32), np.float32))
    assert np.isfinite(m["PSNR"]) and np.isfinite(m["SSIM"])
