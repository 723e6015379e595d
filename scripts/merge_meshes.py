#!/usr/bin/env python
"""Merge separately-simulated layered garments (4D-DRESS upper/lower).

Equivalent of /root/reference/merge_meshes.py:13-44: for each frame,
start from the LOWER pass's full mesh and overwrite its vertices with
the UPPER pass's result at the upper garment's vertex indices
(``reordered_cloth_v_idx`` of ``split_idx_upper.npz``).  Faces/uv lines
are carried over from the lower mesh unchanged.

Usage (after the two physics passes, scripts/physics parity):
    python scripts/merge_meshes.py --seq s170_t1 \
        --output_dir ./output/phys \
        --split_idx_upper ./data/s170_t1/split_idx_upper.npz
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def merge_dirs(upper_dir: str, lower_dir: str, out_dir: str,
               upper_cloth_v_idx) -> int:
    """Merge every frame of two uvmesh dirs; returns frame count."""
    import numpy as np

    from mpmavatar_tpu.train.evaluate import merge_layered_meshes
    from mpmavatar_tpu.utils.io import read_obj, write_obj

    uppers = sorted(glob.glob(os.path.join(upper_dir, "*.obj")))
    lowers = sorted(glob.glob(os.path.join(lower_dir, "*.obj")))
    if len(uppers) != len(lowers):
        raise RuntimeError(
            f"frame count mismatch: {len(uppers)} upper vs "
            f"{len(lowers)} lower meshes")
    os.makedirs(out_dir, exist_ok=True)
    idx = np.asarray(upper_cloth_v_idx)
    for uf, lf in zip(uppers, lowers):
        uv_, _ = read_obj(uf)
        lv, lfaces = read_obj(lf)
        merged = merge_layered_meshes(lv, uv_, idx)
        write_obj(os.path.join(out_dir, os.path.basename(lf)), merged,
                  lfaces)
    return len(uppers)


def main(argv=None):
    import numpy as np

    parser = argparse.ArgumentParser()
    parser.add_argument("--seq", type=str, required=True)
    parser.add_argument("--output_dir", type=str, default="./output/phys")
    parser.add_argument("--split_idx_upper", type=str, required=True,
                        help="split_idx_upper.npz with "
                             "reordered_cloth_v_idx")
    args = parser.parse_args(argv)

    split = np.load(args.split_idx_upper)
    n = merge_dirs(
        os.path.join(args.output_dir, f"{args.seq}_upper", "uvmesh"),
        os.path.join(args.output_dir, f"{args.seq}_lower", "uvmesh"),
        os.path.join(args.output_dir, args.seq, "uvmesh"),
        split["reordered_cloth_v_idx"])
    print(f"merged {n} frames -> "
          f"{os.path.join(args.output_dir, args.seq, 'uvmesh')}")


if __name__ == "__main__":
    main()
