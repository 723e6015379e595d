"""Config reflection + dataset loaders on synthetic on-disk layouts."""

import argparse
import json
import os

import numpy as np
import pytest


def test_config_reflection_and_roundtrip(tmp_path):
    from mpmavatar_tpu.data.config import (ModelParams, OptimizationParams,
                                           add_dataclass_args, dump_config,
                                           extract_dataclass, load_config)
    parser = argparse.ArgumentParser()
    add_dataclass_args(parser, ModelParams)
    args = parser.parse_args(["--grid_size", "128", "--init_E", "150.0",
                              "--test_camera_index", "3", "7"])
    cfg = extract_dataclass(args, ModelParams)
    assert cfg.grid_size == 128
    assert cfg.init_E == 150.0
    assert cfg.test_camera_index == [3, 7]
    # defaults mirror the reference (arguments/__init__.py:96-97)
    assert ModelParams().grid_size == 200
    assert ModelParams().substep == 400
    assert OptimizationParams().densify_until_iter == 15_000

    p = tmp_path / "cfg_args.json"
    dump_config(str(p), cfg)
    cfg2 = load_config(str(p), ModelParams)
    assert cfg2 == cfg


def _make_actorshq_layout(root, n_cams=2, frames=(0, 1), w=32, h=24):
    from PIL import Image
    cam_info = {}
    rng = np.random.default_rng(0)
    for ci in range(n_cams):
        cam_id = f"Cam{ci:03d}"
        c2w = np.eye(4)
        c2w[:3, 3] = [2.0 * np.cos(ci), 1.0, 2.0 * np.sin(ci)]
        cam_info[cam_id] = {
            "W": w, "H": h,
            "K": [[30.0, 0, w / 2], [0, 30.0, h / 2], [0, 0, 1]],
            "RT": c2w.tolist(),
        }
        for sub, suffix, ext in (("rgbs", "rgb", "jpg"),
                                 ("masks", "mask", "png")):
            d = os.path.join(root, "ActorsHQ", "Actor01", "Sequence1",
                             "4x", sub, cam_id)
            os.makedirs(d, exist_ok=True)
            for f in frames:
                img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
                if suffix == "mask":
                    img = img[..., 0]
                Image.fromarray(img).save(
                    os.path.join(d, f"{cam_id}_{suffix}{f:06d}.{ext}"))
    os.makedirs(os.path.join(root, "a1_s1"), exist_ok=True)
    with open(os.path.join(root, "a1_s1", "cam_info.json"), "w") as fp:
        json.dump(cam_info, fp)


def test_actorshq_dataset(tmp_path):
    from mpmavatar_tpu.data.datasets import ActorsHQDataset
    _make_actorshq_layout(str(tmp_path))
    ds = ActorsHQDataset(str(tmp_path), actor=1, sequence=1,
                         frame_index=[0, 1], train=True)
    assert len(ds.camera_list) == 2
    assert ds.scene_radius > 0
    batch = ds.load_frame(0, 1)
    assert batch["rgb"].shape == (3, 24, 32)
    assert batch["msk"].shape == (1, 24, 32)
    assert 0.0 <= batch["rgb"].min() and batch["rgb"].max() <= 1.0

    ds_test = ActorsHQDataset(str(tmp_path), actor=1, sequence=1,
                              frame_index=[0], train=False,
                              test_camera_index=[1])
    assert len(ds_test.camera_list) == 1


def test_scene_wiring(tmp_path):
    from mpmavatar_tpu.data import ModelParams, Scene
    _make_actorshq_layout(str(tmp_path))
    cfg = ModelParams(dataset_dir=str(tmp_path),
                      train_frame_start_num=[0, 2],
                      test_frame_start_num=[0, 1],
                      test_camera_index=[0])
    scene = Scene(cfg)
    assert scene.train_frame_index == [0, 1]
    assert len(scene.test_dataset.camera_list) == 1
