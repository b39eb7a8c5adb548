"""Cloud density loading — the Resources::loadVolumeBuffer analog.

Supported sources:
- ``*.npy`` / ``*.npz`` — dense [Z, Y, X] grids (``npz`` key: ``density``);
- ``procedural:<resolution>:<seed>`` — deterministic synthetic cumulus
  (tests/benchmarks; the reference has no synthetic path, it ships .vdb);
- ``*.vdb`` — via ``tools/vdb_to_npz.py`` (requires pyopenvdb; the
  conversion is an offline import step, exactly like the reference's
  OpenVDB→dense load at init, Resources.cpp:68-155).

All sources are normalized by max density (Resources.cpp:93-96) and padded
by one zero voxel per side (Resources.cpp:89-91) by ``build_scene``'s
caller via ``prepare``.
"""

from __future__ import annotations

import os

import numpy as np

from ..ops import grid as grid_ops
from . import procedural


def load_density(path: str) -> np.ndarray:
    """Raw [Z, Y, X] density from any supported source."""
    if path.startswith("procedural:"):
        parts = path.split(":")
        resolution = int(parts[1]) if len(parts) > 1 else 64
        seed = int(parts[2]) if len(parts) > 2 else 0
        return procedural.cumulus(resolution=resolution, seed=seed)
    ext = os.path.splitext(path)[1].lower()
    if ext == ".npy":
        return np.load(path)
    if ext == ".npz":
        data = np.load(path)
        key = "density" if "density" in data else list(data.keys())[0]
        return data[key]
    if ext == ".vdb":
        npz = path + ".npz"
        if os.path.exists(npz):
            return load_density(npz)
        # Direct parse via the built-in OpenVDB-subset reader (data/vdb.py);
        # handles uncompressed, zlib- and blosc1/LZ4-compressed archives
        # (data/blosc1.py) — no external library needed.
        from . import vdb as vdb_mod

        return vdb_mod.load_density_vdb(path)
    raise ValueError(f"unsupported cloud source: {path}")


def prepare(raw: np.ndarray, pad: int = 1) -> np.ndarray:
    """Normalize by max + one-voxel zero boundary (Resources.cpp:89-96)."""
    return grid_ops.pad_boundary(grid_ops.normalize_density(raw), pad)
