"""Ray/tile data-parallel rendering over a device mesh.

SURVEY.md §2.11 item 1: shard pixels across devices, replicate the scene
(density mips, in-scatter, phase tables), reduce convergence state with
``psum`` — the Welford merge *is* the reference's own cross-replica
reduction (PointRadianceTask.h:54-68), so a psum of moment triples is the
exact multi-chip analog.

``shard_map`` (not bare pjit) is essential here: the path tracer's cascade
compaction gathers live rays with ``jnp.nonzero`` — under global-view pjit
those data-dependent gathers would lower to cross-device collectives every
iteration; under shard_map each device compacts its local ray shard
independently and no communication happens until the final scalar psum.

RNG is keyed by GLOBAL ray ids carried with the rays, so per-sample
radiance values are bitwise identical for any device count; the per-pixel
Welford fold ORDER varies with shard-local compaction timing when a tick
regenerates several subframes per lane, so multi-subframe ticks agree to
float precision and single-subframe ticks bitwise (both tested in
tests/test_parallel.py).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import ProgressiveConfig, SceneConfig
from ..ops import welford as welford_ops
from ..render import camera as camera_ops
from ..render.progressive import (
    ProgressiveState,
    init_state,
    tick_sample_moments,
)
from ..scene import SceneParams, SceneStatic


def make_sharded_tick(
    mesh: Mesh,
    static: SceneStatic,
    n_subframes: int,
    data_axis: str = "data",
) -> Callable:
    """Build the jitted multi-device progressive tick.

    Returns ``tick(params, origins, directions, ray_ids, state, seed_base)
    -> (state, unconverged_count)`` with rays + Welford state sharded over
    ``data_axis`` and the scene replicated.  The unconverged count is the
    only cross-device reduction (one psum per tick).
    """

    def local_tick(params, origins, directions, ray_ids, state, seed_base, cfg_arr):
        s = n_subframes
        # Shared tick estimator (render.progressive.tick_sample_moments):
        # lane regeneration on the deferred loop, legacy megabatch on the
        # oracle — with this shard's GLOBAL ray ids, so per-sample values
        # are bitwise device-layout-invariant (only the per-pixel Welford
        # fold order varies with shard-local compaction timing).
        batch_mean, batch_m2, batch_count = tick_sample_moments(
            params, static, origins, directions, seed_base,
            state.subframe_id, s, ray_ids=ray_ids,
        )
        merged = welford_ops.merge(
            welford_ops.Welford(state.mean, state.m2, state.count),
            welford_ops.Welford(batch_mean, batch_m2, batch_count),
        )
        new_state = ProgressiveState(
            merged.mean, merged.m2, merged.count, state.subframe_id + s
        )
        # Per-pixel 95% CI gate on the red channel (Camera.cpp:244-255);
        # cfg_arr = (min_subframes, rel_tol, abs_tol).  N is the per-pixel
        # FOLDED count (safety-cap-tripped lanes fold fewer than scheduled).
        cnt = jnp.maximum(merged.count[:, 0], 1.0)
        sigma = jnp.sqrt(merged.m2[:, 0] / cnt)
        abs_ci = 1.96 * sigma / jnp.sqrt(cnt)
        rel_ci = abs_ci / (merged.mean[:, 0] + jnp.finfo(jnp.float32).eps)
        converged = (rel_ci < cfg_arr[1]) | (abs_ci < cfg_arr[2])
        local_unconverged = (~converged).sum()
        return new_state, jax.lax.psum(local_unconverged, data_axis)

    def tick(params, origins, directions, ray_ids, state, seed_base, cfg_arr):
        rep = P()
        shard = P(data_axis)
        fn = shard_map(
            local_tick,
            mesh=mesh,
            in_specs=(
                jax.tree.map(lambda _: rep, params),
                shard,
                shard,
                shard,
                ProgressiveState(shard, shard, shard, rep),
                rep,
                rep,
            ),
            out_specs=(ProgressiveState(shard, shard, shard, rep), rep),
            check_vma=False,
        )
        return fn(params, origins, directions, ray_ids, state, seed_base, cfg_arr)

    return jax.jit(tick)


class ShardedProgressiveRenderer:
    """Multi-device progressive path tracing to convergence — the pod-scale
    version of render.progressive.ProgressiveRenderer."""

    def __init__(
        self,
        cfg: SceneConfig,
        params: SceneParams,
        static: SceneStatic,
        mesh: Mesh,
        seed: int = 0,
        data_axis: str = "data",
    ):
        self.cfg = cfg
        self.static = static
        self.mesh = mesh
        self.seed = seed
        n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        basis = camera_ops.camera_basis(cfg.camera)
        origins, directions = camera_ops.generate_rays(
            basis, cfg.camera.width, cfg.camera.height
        )
        n = origins.shape[0]
        assert n % n_dev == 0, (
            f"{n} rays must divide evenly over {n_dev} devices"
        )
        shard = NamedSharding(mesh, P(data_axis))
        rep = NamedSharding(mesh, P())
        self.params = jax.device_put(params, rep)
        self.origins = jax.device_put(origins, shard)
        self.directions = jax.device_put(directions, shard)
        self.ray_ids = jax.device_put(
            jnp.arange(n, dtype=jnp.uint32), shard
        )
        st = init_state(n)
        self.state = ProgressiveState(
            jax.device_put(st.mean, shard),
            jax.device_put(st.m2, shard),
            jax.device_put(st.count, shard),
            jax.device_put(st.subframe_id, rep),
        )
        p = cfg.progressive
        self._cfg_arr = jnp.asarray(
            [p.min_subframes, p.rel_tol, p.abs_tol], jnp.float32
        )
        self._tick = make_sharded_tick(
            mesh, static, p.subframes_per_tick, data_axis
        )

    def tick(self) -> int:
        self.state, unconverged = self._tick(
            self.params,
            self.origins,
            self.directions,
            self.ray_ids,
            self.state,
            jnp.uint32(self.seed),
            self._cfg_arr,
        )
        if int(self.state.subframe_id) < self.cfg.progressive.min_subframes:
            return self.origins.shape[0]
        return int(unconverged)

    def run(self, verbose: bool = False) -> np.ndarray:
        p = self.cfg.progressive
        while int(self.state.subframe_id) < p.max_subframes:
            remaining = self.tick()
            if verbose:
                print(
                    f"subframe {int(self.state.subframe_id)}: "
                    f"{remaining} unconverged"
                )
            if (
                int(self.state.subframe_id) >= p.min_subframes
                and remaining < p.max_unconverged_pixels
            ):
                break
        return self.hdr_image()

    def hdr_image(self) -> np.ndarray:
        h, w = self.cfg.camera.height, self.cfg.camera.width
        return np.asarray(self.state.mean).reshape(h, w, 3)
