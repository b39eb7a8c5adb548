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
        if devs.ndim == len(axis_names):
            axis_sizes = devs.shape  # pre-shaped device grid
        else:
            axis_sizes = (devs.size,) + (1,) * (len(axis_names) - 1)
    return Mesh(devs.reshape(axis_sizes), tuple(axis_names))


def initialize_distributed(**kwargs) -> bool:
    """Multi-host bring-up (``jax.distributed.initialize``; coordinator
    discovery via the standard TPU env, or explicit
    ``coordinator_address``/``num_processes``/``process_id`` kwargs).

    Returns True when the distributed runtime is (now or already) up.
    Explicitly-requested multi-process bring-up FAILS LOUDLY: the only
    swallowed case is the bare single-process call, where falling back to
    local-only operation is the correct behavior.  (Round 1 swallowed every
    error, masking genuine bring-up failures as silent single-process
    runs.)
    """
    explicit = bool(kwargs)
    try:
        jax.distributed.initialize(**kwargs)
        return True
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            return True
        if explicit:
            raise
        return False
    except ValueError:
        if explicit:
            raise
        # Bare call without coordinator env: single-process operation.
        return False
