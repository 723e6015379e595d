"""Mesh / point-cloud IO (port of utils/general_utils.py:318-349).

A C-accelerated OBJ parser (mpmavatar_tpu.native) is used when built;
falls back to pure-python parsing."""

from __future__ import annotations

import numpy as np


def _read_obj_py(path):
    verts, faces = [], []
    with open(path, "r") as f:
        for line in f:
            if line.startswith("v "):
                p = line.split()
                verts.append((float(p[1]), float(p[2]), float(p[3])))
            elif line.startswith("f "):
                p = line.split()
                faces.append(tuple(int(x.split("/")[0]) - 1 for x in p[1:4]))
    return (np.asarray(verts, np.float32),
            np.asarray(faces, np.int32) if faces else
            np.zeros((0, 3), np.int32))


def read_obj(path):
    try:
        from ..native import fast_obj
        return fast_obj.read_obj(path)
    except Exception:
        return _read_obj_py(path)


def write_obj(path, verts, faces=None, extra_lines=None):
    with open(path, "w") as f:
        for v in np.asarray(verts):
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        if extra_lines:
            f.writelines(extra_lines)
        if faces is not None:
            for fc in np.asarray(faces):
                f.write(f"f {fc[0] + 1} {fc[1] + 1} {fc[2] + 1}\n")


def read_ply(path):
    from plyfile import PlyData
    ply = PlyData.read(path)
    verts = np.stack([np.asarray(ply.elements[0][k])
                      for k in ("x", "y", "z")], axis=1).astype(np.float32)
    try:
        faces = np.stack(ply.elements[1]["vertex_indices"]).astype(np.int32)
    except Exception:
        faces = np.zeros((0, 3), np.int32)
    return verts, faces


def write_ply_gaussians(path, xyz, features_dc, features_rest, opacity,
                        scaling, rotation, binding=None):
    """3DGS checkpoint PLY layout (scene/gaussian_model.py:229-264)."""
    from plyfile import PlyData, PlyElement
    n = xyz.shape[0]
    f_dc = np.asarray(features_dc).reshape(n, -1)
    f_rest = np.asarray(features_rest).reshape(n, -1)
    attrs = (["x", "y", "z", "nx", "ny", "nz"]
             + [f"f_dc_{i}" for i in range(f_dc.shape[1])]
             + [f"f_rest_{i}" for i in range(f_rest.shape[1])]
             + ["opacity"]
             + [f"scale_{i}" for i in range(scaling.shape[1])]
             + [f"rot_{i}" for i in range(rotation.shape[1])])
    if binding is not None:
        attrs += ["binding_0"]
    dtype = [(a, "f4") for a in attrs]
    rows = np.concatenate(
        [np.asarray(xyz), np.zeros((n, 3), np.float32), f_dc, f_rest,
         np.asarray(opacity).reshape(n, 1), np.asarray(scaling),
         np.asarray(rotation)]
        + ([np.asarray(binding, np.float32).reshape(n, 1)]
           if binding is not None else []), axis=1)
    el = np.empty(n, dtype=dtype)
    for i, a in enumerate(attrs):
        el[a] = rows[:, i]
    PlyData([PlyElement.describe(el, "vertex")]).write(path)


def read_ply_gaussians(path):
    from plyfile import PlyData
    ply = PlyData.read(path)
    v = ply.elements[0]
    names = [p.name for p in v.properties]
    xyz = np.stack([v["x"], v["y"], v["z"]], 1).astype(np.float32)
    f_dc = np.stack([v[n] for n in names if n.startswith("f_dc_")],
                    1).astype(np.float32)
    f_rest_names = sorted([n for n in names if n.startswith("f_rest_")],
                          key=lambda s: int(s.split("_")[-1]))
    f_rest = (np.stack([v[n] for n in f_rest_names], 1).astype(np.float32)
              if f_rest_names else np.zeros((len(xyz), 0), np.float32))
    opacity = np.asarray(v["opacity"], np.float32)
    scaling = np.stack([v[n] for n in names if n.startswith("scale_")],
                       1).astype(np.float32)
    rotation = np.stack([v[n] for n in names if n.startswith("rot_")],
                        1).astype(np.float32)
    binding = (np.asarray(v["binding_0"], np.int32)
               if "binding_0" in names else None)
    return dict(xyz=xyz, features_dc=f_dc, features_rest=f_rest,
                opacity=opacity, scaling=scaling, rotation=rotation,
                binding=binding)
