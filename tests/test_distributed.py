"""Multi-process jax.distributed CPU loopback (SURVEY.md §4(c)): the
2-process 8-device render must be bitwise identical to the single-process
render — the 'test multi-node without a cluster' harness the reference
could never have (it is single-GPU by construction, SURVEY.md §2.11)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from deepestscatter_tpu import scene as scene_mod
from deepestscatter_tpu.config import CameraConfig, CloudModel, SceneConfig
from deepestscatter_tpu.render import inscatter
from deepestscatter_tpu.render.progressive import ProgressiveRenderer

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _scene():
    from deepestscatter_tpu.data import procedural

    cfg = SceneConfig(
        cloud=CloudModel(size_m=1200.0),
        camera=CameraConfig(width=32, height=16),
    )
    density = procedural.cumulus(resolution=24, seed=2)
    params, static = scene_mod.build_scene(cfg, density)
    params = inscatter.with_baked_inscatter(params, static)
    return cfg, params, static


def test_scaling_harness_runs():
    """tools/scaling.py measures rays/s per device count on the virtual
    mesh and reports efficiency relative to 1 device."""
    from tools import scaling

    rows = scaling.measure(
        [1, 2], width=32, height=16, subframes=1, ticks=1, resolution=16
    )
    assert [r["devices"] for r in rows] == [1, 2]
    assert rows[0]["efficiency"] == 1.0
    assert all(r["mrays_per_s"] > 0 for r in rows)


def test_scaling_8_devices_total_throughput_floor():
    """8 virtual devices must not COLLAPSE total throughput: on a shared-
    core host per-device efficiency is bounded by cores/devices, but the
    sharded program's aggregate rate must stay within 2x of single-device
    (a generous floor that catches collective storms / pathological
    sharding; the committed SCALING.json artifact records the full table)."""
    from tools import scaling

    rows = scaling.measure(
        [1, 8], width=32, height=16, subframes=2, ticks=2, resolution=16
    )
    assert [r["devices"] for r in rows] == [1, 8]
    assert rows[1]["mrays_per_s"] > 0.5 * rows[0]["mrays_per_s"]


def test_two_process_loopback_bitwise_matches_single(tmp_path):
    port = _free_port()
    nprocs = 2
    procs = []
    outs = []
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    for pid in range(nprocs):
        out = str(tmp_path / f"worker{pid}.npz")
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    os.path.join(_REPO, "tests", "_dist_worker.py"),
                    str(pid),
                    str(nprocs),
                    str(port),
                    out,
                ],
                cwd=_REPO,
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    logs = []
    try:
        for p in procs:
            stdout, _ = p.communicate(timeout=420)
            logs.append(stdout.decode(errors="replace"))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out\n" + "\n".join(logs))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log}"

    # Reassemble the global mean from each process's addressable shards.
    cfg, params, static = _scene()
    n = cfg.camera.width * cfg.camera.height
    mean = np.full((n, 3), np.nan, np.float32)
    unconverged = set()
    for out in outs:
        data = np.load(out)
        unconverged.add(int(data["unconverged"]))
        for key in data.files:
            if key.startswith("rows_"):
                start = int(key.split("_")[1])
                rows = data[key]
                mean[start : start + rows.shape[0]] = rows
    assert np.isfinite(mean).all(), "missing shards in reassembly"
    assert len(unconverged) == 1, "processes disagree on the psum'd count"

    single = ProgressiveRenderer(cfg, params, static, seed=3)
    single.tick()
    np.testing.assert_array_equal(np.asarray(single.state.mean), mean)
