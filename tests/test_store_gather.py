"""Native point-gather reads (rs_gather): shuffled training batches must
cost O(batch) records regardless of table size (VERDICT r1: the covering-
range read approached O(table) per batch on a 15M-record store)."""

import numpy as np
import pytest

from deepestscatter_tpu.data import records
from deepestscatter_tpu.data.datasets import DisneyDataset
from deepestscatter_tpu.data.store import RecordStore, Table


def test_gather_matches_read_on_100k_records(tmp_path):
    """Correctness at scale: 120k records, random id gathers equal the
    contiguous read's rows."""
    n = 120_000
    t = Table(str(tmp_path / "Result.rec"), records.SCHEMAS["Result"])
    data = np.zeros(n, records.SCHEMAS["Result"])
    data["light_intensity"] = np.arange(n, dtype=np.float32)
    data["is_converged"] = 1
    t.batch_append(0, data)
    assert t.count() == n

    rng = np.random.default_rng(0)
    ids = rng.integers(0, n, size=1024)
    got = t.gather(ids)
    np.testing.assert_array_equal(
        got["light_intensity"], ids.astype(np.float32)
    )

    with pytest.raises(IndexError):
        t.gather(np.array([n], np.uint64))
    t.close()


def test_batch_rows_touched_independent_of_table_size(tmp_path):
    """The dataset's batch assembly touches exactly O(batch) rows: build
    two stores (512 and 8192 records), count rows requested through the
    Table API — identical per batch, NOT proportional to the table span."""

    class CountingTable:
        def __init__(self, inner):
            self._inner = inner
            self.rows = 0

        def gather(self, ids):
            self.rows += len(ids)
            return self._inner.gather(ids)

        def read(self, start, n):
            self.rows += n
            return self._inner.read(start, n)

        def __getattr__(self, name):
            return getattr(self._inner, name)

    def build(root, n):
        store = RecordStore(str(root))
        setups = np.zeros(1, records.SCHEMAS["SceneSetup"])
        setups["light_direction"] = (0.0, -1.0, 0.0)
        store.table("SceneSetup").batch_append(0, setups)
        samples = np.zeros(n, records.SCHEMAS["ScatterSample"])
        samples["view_direction"] = (0.0, 0.0, 1.0)
        store.table("ScatterSample").batch_append(0, samples)
        results = np.zeros(n, records.SCHEMAS["Result"])
        results["is_converged"] = 1
        results["light_intensity"] = 1.0
        store.table("Result").batch_append(0, results)
        grids = np.zeros(n, records.SCHEMAS["DisneyDescriptor"])
        store.table("DisneyDescriptor").batch_append(0, grids)
        return store

    batch = 128
    counts = {}
    for n in (512, 8192):
        store = build(tmp_path / f"s{n}", n)
        ds = DisneyDataset(store, batch_size=batch)
        counting = {}

        orig_table = store.table

        def table(name, _orig=orig_table, _c=counting):
            if name not in _c:
                _c[name] = CountingTable(_orig(name))
            return _c[name]

        store.table = table
        ds._scene_cache.clear()
        got = 0
        for item, labels in ds.batches(batch, seed=1):
            got += 1
            if got >= 4:
                break
        assert got == 4
        counts[n] = sum(
            c.rows for name, c in counting.items() if name != "SceneSetup"
        )
        store.close()

    # 4 batches x 3 tables x 128 rows each — IDENTICAL for both sizes.
    assert counts[512] == counts[8192] == 4 * 3 * batch
