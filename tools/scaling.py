"""Scaling harness: rays/s of the sharded progressive renderer at 1..N
devices (BASELINE.md target: "rays/s scaling ... report scaling
efficiency").

On real hardware run it on the pod slice directly; without one it measures
the virtual CPU mesh (functional scaling — collective counts, sharding
correctness, load balance — not silicon throughput, since virtual devices
share host cores):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
        python tools/scaling.py --out SCALING.json

Writes a JSON table {devices, mrays_per_s, efficiency} and prints it.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def measure(n_devices_list, width=256, height=128, subframes=2, ticks=3,
            resolution=48, size_m=2000.0):
    import jax
    import numpy as np

    from deepestscatter_tpu import scene as scene_mod
    from deepestscatter_tpu.config import (
        CameraConfig,
        CloudModel,
        ProgressiveConfig,
        SceneConfig,
    )
    from deepestscatter_tpu.data import procedural
    from deepestscatter_tpu.parallel import make_mesh
    from deepestscatter_tpu.parallel.render import ShardedProgressiveRenderer
    from deepestscatter_tpu.render import inscatter

    cfg = SceneConfig(
        cloud=CloudModel(size_m=size_m),
        camera=CameraConfig(width=width, height=height),
        progressive=ProgressiveConfig(subframes_per_tick=subframes),
    )
    density = procedural.cumulus(resolution=resolution, seed=11)
    params, static = scene_mod.build_scene(cfg, density)
    params = inscatter.with_baked_inscatter(params, static)

    devices = jax.devices()
    rows = []
    for n_dev in n_devices_list:
        if n_dev > len(devices):
            print(f"skip {n_dev} devices (only {len(devices)} available)")
            continue
        mesh = make_mesh(devices=devices[:n_dev])
        r = ShardedProgressiveRenderer(cfg, params, static, mesh, seed=1)
        r.tick()  # compile + warm
        t0 = time.time()
        for _ in range(ticks):
            r.tick()
        jax.block_until_ready(r.state.mean)
        dt = time.time() - t0
        mrays = width * height * subframes * ticks / dt / 1e6
        rows.append({"devices": n_dev, "mrays_per_s": round(mrays, 4)})
        print(f"{n_dev} devices: {mrays:.4f} Mrays/s ({dt:.2f}s)")
        assert np.isfinite(np.asarray(r.state.mean)).all()
    if rows:
        base = rows[0]["mrays_per_s"] / rows[0]["devices"]
        for row in rows:
            row["efficiency"] = round(
                row["mrays_per_s"] / (base * row["devices"]), 4
            )
    return rows


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--devices", default="1,2,4,8",
                   help="comma-separated device counts")
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--height", type=int, default=128)
    p.add_argument("--subframes", type=int, default=2)
    p.add_argument("--ticks", type=int, default=3)
    p.add_argument("--out", default=None, help="write JSON table here")
    args = p.parse_args(argv)
    counts = [int(x) for x in args.devices.split(",") if x]
    rows = measure(counts, args.width, args.height, args.subframes, args.ticks)
    import jax

    import os

    result = {
        "platform": jax.devices()[0].platform,
        "host_cores": os.cpu_count(),
        "note": (
            "virtual CPU mesh: functional scaling only (all virtual devices "
            "share the host cores, so per-device efficiency is bounded by "
            "host_cores/devices; the meaningful signal is that TOTAL "
            "throughput rises with device count and the sharded program is "
            "correct)" if jax.devices()[0].platform == "cpu" else "real devices"
        ),
        "rows": rows,
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    return result


if __name__ == "__main__":
    main(sys.argv[1:])
