"""Offline .vdb -> .npz converter — the import step of the reference's
Resources::loadVolumeBuffer (DG/src/Util/Resources.cpp:68-155: OpenVDB
stream -> dense grid).  Output: ``<file>.vdb.npz`` with a ``density`` array
([Z, Y, X] float32) that ``deepestscatter_tpu.data.clouds.load_density``
reads directly.

Backend order:
1. ``pyopenvdb`` when importable (handles every OpenVDB feature, incl.
   blosc compression);
2. the built-in pure-Python subset reader (``deepestscatter_tpu.data.vdb``)
   otherwise — zip/uncompressed float 5-4-3 grids.

Usage:  python tools/vdb_to_npz.py cloud.vdb [more.vdb ...] [--grid density]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _convert_pyopenvdb(path: str, grid_name: str | None) -> np.ndarray | None:
    try:
        import pyopenvdb  # type: ignore
    except ImportError:
        return None
    grids = pyopenvdb.readAllGridMetadata(path)
    name = grid_name
    if name is None:
        names = [g.name for g in grids]
        name = "density" if "density" in names else names[0]
    grid = pyopenvdb.read(path, name)
    bbox_min, bbox_max = grid.evalActiveVoxelBoundingBox()
    shape_xyz = [bbox_max[i] - bbox_min[i] + 1 for i in range(3)]
    dense = np.zeros(shape_xyz, dtype=np.float32)  # [X, Y, Z]
    grid.copyToArray(dense, ijk=bbox_min)
    return np.ascontiguousarray(dense.transpose(2, 1, 0))  # -> [Z, Y, X]


def convert(path: str, grid_name: str | None = None) -> str:
    dense = _convert_pyopenvdb(path, grid_name)
    if dense is None:
        from deepestscatter_tpu.data import vdb as vdb_mod

        dense = vdb_mod.load_density_vdb(path, grid_name)
    out = path + ".npz"
    np.savez_compressed(out, density=dense)
    print(f"{path}: [Z,Y,X]={dense.shape} max={dense.max():.4g} -> {out}")
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("paths", nargs="+", help=".vdb files to convert")
    ap.add_argument("--grid", default=None, help="grid name (default: density)")
    args = ap.parse_args()
    for path in args.paths:
        convert(path, args.grid)


if __name__ == "__main__":
    main()
