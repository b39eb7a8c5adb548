"""Training datasets — DisneyDataset / BakedDataset parity, batch-native.

The reference assembles items one at a time in DataLoader workers
(BaseDataset.__getitem__: 3-4 LMDB point reads + numpy angle math per
sample — SURVEY.md §3.3 calls it the input-pipeline hot path).  Here whole
batches are assembled vectorized from the record store's contiguous numpy
arrays — no worker processes, no per-item deserialization — and stream to
the jit train step as one pytree.

Parity notes:
- Disney item: descriptor [10, 225]/256 with ω appended → [10, 226];
  label = Result.light_intensity; converged-only (DisneyDataset.py:32-41).
- Baked item: 4 probe descriptors [9, 225], 4 powers, realtime descriptor
  [3, 225]+ω → [3, 226], ω, α (BakedDataset.py:16-69; α via
  ops.descriptor.alpha_angle — the same descriptorBasis/signedAngle math).
- Length = min(count(main), count(Result)) (BaseDataset.py:20-24);
  sceneId = index // 2048 (BaseDataset.py:32).
"""

from __future__ import annotations

from typing import Dict, Iterator, Tuple

import numpy as np

from ..ops import descriptor as desc_ops
from . import records
from .store import RecordStore


def _omega(light: np.ndarray, view: np.ndarray) -> np.ndarray:
    """angleBetween(light, view) (Vector.py:18-19), batched."""
    ln = light / np.linalg.norm(light, axis=-1, keepdims=True)
    vn = view / np.linalg.norm(view, axis=-1, keepdims=True)
    return np.arccos(np.clip((ln * vn).sum(-1), -1.0, 1.0)).astype(np.float32)


def _alpha(light: np.ndarray, view: np.ndarray, probe_dir: np.ndarray) -> np.ndarray:
    """Signed descriptor-basis angle (BakedDataset.py:56-69), batched via
    the JAX implementation (shared with the renderer)."""
    import jax.numpy as jnp

    return np.asarray(
        desc_ops.alpha_angle(
            jnp.asarray(light), jnp.asarray(view), jnp.asarray(probe_dir)
        )
    )


class _Base:
    def __init__(self, store: RecordStore, main_table: str,
                 batch_size: int = records.BATCH_SIZE):
        self.store = store
        self.main_table = main_table
        self.batch_size = batch_size
        self._scene_cache: Dict[int, np.void] = {}

    def __len__(self) -> int:
        return min(
            self.store.count(self.main_table), self.store.count("Result")
        )

    def _scene_light(self, scene_ids: np.ndarray) -> np.ndarray:
        """Light directions of each sample's SceneSetup (cached per scene)."""
        out = np.zeros((len(scene_ids), 3), np.float32)
        table = self.store.table("SceneSetup")
        for i, sid in enumerate(scene_ids):
            sid = int(sid)
            if sid not in self._scene_cache:
                self._scene_cache[sid] = table.get_record(sid)
            out[i] = self._scene_cache[sid]["light_direction"]
        return out

    def _common(self, start: int, n: int):
        samples = self.store.table("ScatterSample").read(start, n)
        results = self.store.table("Result").read(start, n)
        light = self._scene_light(samples["scene_setup_id"])
        view = samples["view_direction"].astype(np.float32)
        labels = results["light_intensity"].astype(np.float32)
        converged = results["is_converged"].astype(bool)
        return samples, light, view, labels, converged

    def batches(
        self, batch: int, seed: int, drop_unconverged: bool = True
    ) -> Iterator[Tuple[dict, np.ndarray]]:
        """Shuffled epoch of batches.  Unconverged labels are dropped (the
        reference asserts convergence per item, DisneyDataset.py:41)."""
        n = len(self)
        order = np.random.default_rng(seed).permutation(n)
        for s in range(0, n - batch + 1, batch):
            idx = np.sort(order[s : s + batch])
            item, labels, ok = self._gather(idx)
            if drop_unconverged:
                item = {k: v[ok] for k, v in item.items()}
                labels = labels[ok]
            if len(labels):
                yield item, labels


class DisneyDataset(_Base):
    """RPNN training items (DisneyDataset.py:8-43)."""

    def __init__(self, store: RecordStore, batch_size: int = records.BATCH_SIZE):
        super().__init__(store, "DisneyDescriptor", batch_size)

    def _gather(self, idx: np.ndarray):
        # Native point gathers: O(batch) bytes regardless of table size
        # (idx arrives sorted for locality).  A covering-range read is
        # O(span) ≈ O(table) for a shuffled batch over a 15M-record table.
        grids = self.store.table("DisneyDescriptor").gather(idx)["grid"]
        samples = self.store.table("ScatterSample").gather(idx)
        results = self.store.table("Result").gather(idx)
        light = self._scene_light(samples["scene_setup_id"])
        view = samples["view_direction"].astype(np.float32)
        omega = _omega(light, view)
        desc = grids.reshape(-1, 10, 225).astype(np.float32) / 256.0
        z = np.concatenate(
            [desc, np.broadcast_to(omega[:, None, None], (len(idx), 10, 1))],
            axis=-1,
        )
        return (
            {"z_layers": z},
            results["light_intensity"].astype(np.float32),
            results["is_converged"].astype(bool),
        )


class BakedDataset(_Base):
    """Two-stage model training items (BakedDataset.py:8-75)."""

    def __init__(
        self,
        store: RecordStore,
        baked_layers: int = 9,
        realtime_layers: int = 3,
        batch_size: int = records.BATCH_SIZE,
    ):
        super().__init__(store, "BakedInterpolationSet", batch_size)
        self.baked_layers = baked_layers
        self.realtime_layers = realtime_layers

    def _gather(self, idx: np.ndarray):
        sets = self.store.table("BakedInterpolationSet").gather(idx)
        disney = self.store.table("DisneyDescriptor").gather(idx)["grid"]
        samples = self.store.table("ScatterSample").gather(idx)
        results = self.store.table("Result").gather(idx)
        light = self._scene_light(samples["scene_setup_id"])
        view = samples["view_direction"].astype(np.float32)
        n = len(idx)

        probe_desc = np.stack(
            [
                sets[c]["grid"].reshape(n, 10, 225)[:, : self.baked_layers]
                for c in "abcd"
            ],
            axis=1,
        ).astype(np.float32) / 256.0  # [n, 4, L, 225]
        powers = np.stack([sets[c]["power"] for c in "abcd"], axis=1).astype(
            np.float32
        )
        omega = _omega(light, view)
        alpha = _alpha(light, view, sets["a"]["direction"].astype(np.float32))
        rt = disney.reshape(n, 10, 225)[:, : self.realtime_layers].astype(
            np.float32
        ) / 256.0
        rt = np.concatenate(
            [rt, np.broadcast_to(omega[:, None, None], (n, self.realtime_layers, 1))],
            axis=-1,
        )
        item = {
            "probe_descriptors": probe_desc,
            "probe_powers": powers,
            "disney_descriptor": rt,
            "omega": omega,
            "alpha": alpha,
        }
        return (
            item,
            results["light_intensity"].astype(np.float32),
            results["is_converged"].astype(bool),
        )
