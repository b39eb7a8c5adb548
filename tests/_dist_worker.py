"""Worker process for the multi-process jax.distributed loopback test
(SURVEY.md §4(c)): each process owns 4 virtual CPU devices of a 2-process,
8-device global mesh, runs one sharded progressive render tick, and writes
its addressable shards of the Welford mean for the parent to reassemble.

Usage: python tests/_dist_worker.py <pid> <nprocs> <port> <out.npz>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main(process_id: int, num_processes: int, port: int, out_path: str):
    from deepestscatter_tpu.parallel.mesh import initialize_distributed

    ok = initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert ok, "distributed bring-up failed"
    assert jax.process_count() == num_processes
    assert len(jax.devices()) == 4 * num_processes, (
        f"expected {4 * num_processes} global devices, got {len(jax.devices())}"
    )

    from deepestscatter_tpu import scene as scene_mod
    from deepestscatter_tpu.config import CameraConfig, CloudModel, SceneConfig
    from deepestscatter_tpu.data import procedural
    from deepestscatter_tpu.parallel import make_mesh
    from deepestscatter_tpu.parallel.render import ShardedProgressiveRenderer
    from deepestscatter_tpu.render import inscatter

    # Must match tests/test_distributed.py::_scene exactly.
    cfg = SceneConfig(
        cloud=CloudModel(size_m=1200.0),
        camera=CameraConfig(width=32, height=16),
    )
    density = procedural.cumulus(resolution=24, seed=2)
    params, static = scene_mod.build_scene(cfg, density)
    params = inscatter.with_baked_inscatter(params, static)

    mesh = make_mesh()  # all 8 global devices on the "data" axis
    r = ShardedProgressiveRenderer(cfg, params, static, mesh, seed=3)
    unconverged = r.tick()

    shards = {}
    for s in r.state.mean.addressable_shards:
        shards[f"rows_{s.index[0].start}"] = np.asarray(s.data)
    np.savez(
        out_path,
        unconverged=np.int64(unconverged),
        subframe_id=np.asarray(r.state.subframe_id),
        **shards,
    )
    print(f"worker {process_id}: wrote {len(shards)} shards -> {out_path}")


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
