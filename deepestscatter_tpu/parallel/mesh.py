"""Device-mesh construction — the communication substrate.

The reference has NO distributed layer (SURVEY.md §2.11: single GPU,
``getEnabledDevices()[0]``, ``cuda:0``).  Here mesh axes are first-class:

- ``data``  — rays/tiles for rendering, batch for training (the dominant
  axis; the reference's implicit \"disjoint scene-id ranges\" strategy
  generalizes to sharded megabatches with psum'd Welford reductions);
- ``space`` — optional spatial axis for sharding voxel work (bakes).

Multi-host: ``initialize_distributed`` wraps ``jax.distributed.initialize``;
XLA collectives then ride ICI within a slice and DCN across slices — no
hand-written transport, as planned in SURVEY.md §5.8.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    axis_sizes: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh over the available devices.

    Default: all devices on one ``data`` axis.  ``axis_sizes`` reshapes
    (e.g. ``(4, 2)`` with names ``("data", "space")``).
    """
    devs = np.asarray(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = (len(devs),) + (1,) * (len(axis_names) - 1)
    return Mesh(devs.reshape(axis_sizes), tuple(axis_names))


def initialize_distributed(**kwargs) -> None:
    """Multi-host bring-up (coordinator discovery via the standard TPU env);
    safe no-op when already initialized or single-process."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass
