"""Device-resident training data: upload the record tables once, assemble
batches ON DEVICE from index arrays.

The reference's input pipeline materializes items one at a time in
DataLoader workers (BaseDataset.__getitem__); round 4's batch-native
assembly (data/datasets.py) removed the per-item cost but still built
every batch on the HOST and shipped it through the tunnel per step —
at reference scale (15M samples, 200 epochs) that is terabytes of
host->device traffic and one dispatch round-trip per step.

Here the raw uint8 descriptor tables live in HBM (a 100k-label dataset is
~225 MB for the RPNN, ~1.1 GB for the baked pipeline — far under one
chip's HBM), batches are gathered on device from an uploaded [steps, B]
index schedule, and ``validate_every`` optimizer steps run as ONE jitted
``lax.scan`` (trainer.make_chunk_step).  Per-chunk traffic: a few hundred
KB of indices.

Float feature math (dequantize /256, ω append) matches
data/datasets.py exactly; the index pools are restricted to CONVERGED
labels up front (the reference asserts convergence per item,
DisneyDataset.py:41 — round 4 dropped unconverged rows per batch, which
made batch sizes ragged; a converged-only pool keeps shapes static for
jit).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.datasets import _alpha, _omega
from ..data.store import RecordStore

#: Upload slice size — bounded transfers through the tunneled backend.
_UPLOAD_CHUNK = 1 << 26  # 64 MB


def _to_device(arr: np.ndarray) -> jnp.ndarray:
    """Chunked host->device upload (single large transfers can stall the
    tunneled worker; see docs/PERFORMANCE.md measurement notes)."""
    if arr.nbytes <= _UPLOAD_CHUNK:
        return jnp.asarray(arr)
    rows_per = max(1, _UPLOAD_CHUNK // max(1, arr[0:1].nbytes))
    parts = [
        jax.device_put(np.ascontiguousarray(arr[i : i + rows_per]))
        for i in range(0, arr.shape[0], rows_per)
    ]
    return jnp.concatenate(parts, axis=0)


def _scene_lights(store: RecordStore, scene_ids: np.ndarray) -> np.ndarray:
    setups = store.table("SceneSetup")
    uniq = {int(s): setups.get_record(int(s))["light_direction"]
            for s in np.unique(scene_ids)}
    out = np.zeros((len(scene_ids), 3), np.float32)
    for i, s in enumerate(scene_ids):
        out[i] = uniq[int(s)]
    return out


class DeviceDisneyData:
    """RPNN tables in HBM + on-device batch assembly (DisneyDataset
    semantics: z = [grid/256, ω] per layer; labels = light_intensity)."""

    def __init__(self, store: RecordStore):
        n = min(store.count("DisneyDescriptor"), store.count("Result"))
        grids = store.table("DisneyDescriptor").read(0, n)["grid"]
        samples = store.table("ScatterSample").read(0, n)
        results = store.table("Result").read(0, n)
        light = _scene_lights(store, samples["scene_setup_id"])
        view = samples["view_direction"].astype(np.float32)
        self.omega_h = _omega(light, view)
        self.labels_h = results["light_intensity"].astype(np.float32)
        self.converged = results["is_converged"].astype(bool)
        self.n = n
        self.grids = _to_device(grids.reshape(n, -1))
        self.omega = jnp.asarray(self.omega_h)
        self.labels = jnp.asarray(self.labels_h)

    def pool(self) -> np.ndarray:
        return np.arange(self.n)[self.converged]

    def assemble(self, idx: jnp.ndarray):
        g = jnp.take(self.grids, idx, axis=0).reshape(-1, 10, 225)
        z = g.astype(jnp.float32) / 256.0
        om = jnp.take(self.omega, idx)
        z = jnp.concatenate(
            [z, jnp.broadcast_to(om[:, None, None], (z.shape[0], 10, 1))], -1
        )
        return {"z_layers": z}, jnp.take(self.labels, idx)


class DeviceBakedData:
    """Baked-pipeline tables in HBM (BakedDataset semantics: 4 probe
    descriptors' first ``baked_layers`` layers, powers, 3-layer realtime
    descriptor + ω, ω, α)."""

    def __init__(self, store: RecordStore, baked_layers: int = 9,
                 realtime_layers: int = 3):
        n = min(store.count("BakedInterpolationSet"), store.count("Result"))
        sets = store.table("BakedInterpolationSet").read(0, n)
        disney = store.table("DisneyDescriptor").read(0, n)["grid"]
        samples = store.table("ScatterSample").read(0, n)
        results = store.table("Result").read(0, n)
        light = _scene_lights(store, samples["scene_setup_id"])
        view = samples["view_direction"].astype(np.float32)
        self.n = n
        self.L = baked_layers
        self.R = realtime_layers
        # Slice to the consumed layers BEFORE upload (9/10 and 3/10).
        self.probe_grids = tuple(
            _to_device(
                np.ascontiguousarray(
                    sets[c]["grid"].reshape(n, 10, 225)[:, :baked_layers]
                ).reshape(n, -1)
            )
            for c in "abcd"
        )
        self.powers = jnp.asarray(
            np.stack([sets[c]["power"] for c in "abcd"], 1).astype(np.float32)
        )
        self.rt = _to_device(
            np.ascontiguousarray(
                disney.reshape(n, 10, 225)[:, :realtime_layers]
            ).reshape(n, -1)
        )
        self.omega_h = _omega(light, view)
        self.alpha_h = _alpha(
            light, view, sets["a"]["direction"].astype(np.float32)
        )
        self.labels_h = results["light_intensity"].astype(np.float32)
        self.converged = results["is_converged"].astype(bool)
        self.omega = jnp.asarray(self.omega_h)
        self.alpha = jnp.asarray(self.alpha_h)
        self.labels = jnp.asarray(self.labels_h)

    def pool(self) -> np.ndarray:
        return np.arange(self.n)[self.converged]

    def assemble(self, idx: jnp.ndarray):
        b = idx.shape[0]
        probe = jnp.stack(
            [
                jnp.take(g, idx, axis=0)
                .reshape(b, self.L, 225)
                .astype(jnp.float32)
                / 256.0
                for g in self.probe_grids
            ],
            axis=1,
        )  # [B, 4, L, 225]
        om = jnp.take(self.omega, idx)
        rt = (
            jnp.take(self.rt, idx, axis=0)
            .reshape(b, self.R, 225)
            .astype(jnp.float32)
            / 256.0
        )
        rt = jnp.concatenate(
            [rt, jnp.broadcast_to(om[:, None, None], (b, self.R, 1))], -1
        )
        item = {
            "probe_descriptors": probe,
            "probe_powers": jnp.take(self.powers, idx, axis=0),
            "disney_descriptor": rt,
            "omega": om,
            "alpha": jnp.take(self.alpha, idx),
        }
        return item, jnp.take(self.labels, idx)


def epoch_schedule(pool: np.ndarray, batch: int, seed: int,
                   epoch: int) -> np.ndarray:
    """[steps, batch] int32 index schedule — a shuffled epoch over the
    converged pool (order keyed by (seed, epoch) like the legacy path, so
    resume-by-skipping replays the identical schedule)."""
    order = np.random.default_rng(seed + epoch).permutation(pool)
    steps = len(order) // batch
    return order[: steps * batch].reshape(steps, batch).astype(np.int32)
