"""OpenVDB-subset reader/writer round-trip tests (data/vdb.py) — the
Resources::loadVolumeBuffer ingestion analog (Resources.cpp:68-155)."""

import numpy as np
import pytest

from deepestscatter_tpu.data import clouds, vdb


def _random_sparse(shape_zyx, seed, density=0.1):
    rng = np.random.default_rng(seed)
    dense = rng.random(shape_zyx, dtype=np.float32)
    dense[rng.random(shape_zyx) > density] = 0.0
    return dense


@pytest.mark.parametrize(
    "shape",
    [(8, 8, 8), (17, 9, 23), (64, 64, 64), (130, 40, 70)],
)
def test_roundtrip_shapes(tmp_path, shape):
    dense = _random_sparse(shape, seed=sum(shape))
    path = str(tmp_path / "cloud.vdb")
    vdb.write_vdb(path, vdb.VdbGrid("density", dense, voxel_size=2.5))
    grids = vdb.read_vdb(path)
    assert len(grids) == 1
    g = grids[0]
    assert g.name == "density"
    assert g.voxel_size == pytest.approx(2.5)
    # The reader densifies the LEAF-ALIGNED occupied bounding box (leaves
    # are 8^3); embed the source into that box and compare.
    occ = np.nonzero(dense)
    lo = [(int(a.min()) // 8) * 8 for a in occ]
    hi = [(int(a.max()) // 8) * 8 + 8 for a in occ]
    expected = np.zeros([h - l for l, h in zip(lo, hi)], np.float32)
    src = dense[lo[0] : hi[0], lo[1] : hi[1], lo[2] : hi[2]]
    expected[: src.shape[0], : src.shape[1], : src.shape[2]] = src
    assert g.dense.shape == expected.shape
    np.testing.assert_array_equal(g.dense, expected)
    assert g.bbox_min == (lo[2], lo[1], lo[0])  # (x, y, z)


def test_roundtrip_dense_values(tmp_path):
    """Fully dense grid: every voxel survives exactly."""
    dense = np.arange(16 * 16 * 16, dtype=np.float32).reshape(16, 16, 16) + 1
    path = str(tmp_path / "dense.vdb")
    vdb.write_vdb(path, vdb.VdbGrid("density", dense))
    g = vdb.read_vdb(path)[0]
    np.testing.assert_array_equal(g.dense, dense)


def test_empty_grid(tmp_path):
    path = str(tmp_path / "empty.vdb")
    vdb.write_vdb(path, vdb.VdbGrid("density", np.zeros((8, 8, 8), np.float32)))
    g = vdb.read_vdb(path)[0]
    assert g.dense.max() == 0.0


def test_bad_magic(tmp_path):
    path = tmp_path / "bogus.vdb"
    path.write_bytes(b"not a vdb archive at all....")
    with pytest.raises(vdb.VdbFormatError, match="magic"):
        vdb.read_vdb(str(path))


def test_blosc_rejected(tmp_path):
    """A grid flagged blosc-compressed must fail with the converter hint."""
    import struct

    dense = np.ones((8, 8, 8), np.float32)
    path = str(tmp_path / "b.vdb")
    vdb.write_vdb(path, vdb.VdbGrid("density", dense))
    raw = bytearray(open(path, "rb").read())
    # Patch the per-grid compression flags (uint32 right after the two
    # strings following the grid count).
    off = 8 + 4 + 8 + 1 + 36 + 4 + 4  # header + empty metamap + grid count
    off += 4 + len("density") + 4 + len("Tree_float_5_4_3")
    raw[off : off + 4] = struct.pack("<I", vdb.COMPRESS_BLOSC)
    open(path, "wb").write(bytes(raw))
    with pytest.raises(vdb.VdbFormatError, match="blosc"):
        vdb.read_vdb(path)


def test_clouds_load_density_vdb(tmp_path):
    """clouds.load_density reads .vdb directly through the subset parser."""
    dense = _random_sparse((32, 24, 40), seed=7, density=0.3)
    path = str(tmp_path / "cumulus.vdb")
    vdb.write_vdb(path, vdb.VdbGrid("density", dense))
    loaded = clouds.load_density(path)
    assert loaded.shape <= dense.shape  # bbox-cropped
    assert loaded.max() == pytest.approx(dense.max())


def test_vdb_to_npz_tool(tmp_path):
    from tools import vdb_to_npz

    dense = _random_sparse((16, 16, 16), seed=3, density=0.5)
    path = str(tmp_path / "c.vdb")
    vdb.write_vdb(path, vdb.VdbGrid("density", dense))
    out = vdb_to_npz.convert(path)
    arr = np.load(out)["density"]
    assert arr.dtype == np.float32
    assert arr.max() == pytest.approx(dense.max())


def test_masked_value_compression_read(tmp_path):
    """Reader handles active-mask + zip compressed buffers (the default
    OpenVDB-without-blosc encoding) — synthesized at the buffer level."""
    import io as _io
    import struct
    import zlib

    count = 512
    rng = np.random.default_rng(0)
    value_mask = rng.random(count) < 0.4
    active_vals = rng.random(int(value_mask.sum()), dtype=np.float32)
    background = np.float32(0.125)

    payload = active_vals.astype("<f4").tobytes()
    zipped = zlib.compress(payload)
    buf = _io.BytesIO()
    buf.write(struct.pack("<b", vdb.NO_MASK_OR_INACTIVE_VALS))
    buf.write(struct.pack("<q", len(zipped)))
    buf.write(zipped)
    buf.seek(0)
    out = vdb._read_compressed_values(
        buf,
        count,
        value_mask,
        vdb.COMPRESS_ZIP | vdb.COMPRESS_ACTIVE_MASK,
        float(background),
    )
    np.testing.assert_array_equal(out[value_mask], active_vals)
    np.testing.assert_array_equal(
        out[~value_mask], np.full((~value_mask).sum(), background)
    )


def test_two_inactive_vals_selection_mask():
    """MASK_AND_TWO_INACTIVE_VALS: selection mask picks inactiveVal1."""
    import io as _io
    import struct

    count = 512
    rng = np.random.default_rng(1)
    value_mask = rng.random(count) < 0.3
    sel = (~value_mask) & (rng.random(count) < 0.5)
    active_vals = rng.random(int(value_mask.sum()), dtype=np.float32)

    buf = _io.BytesIO()
    buf.write(struct.pack("<b", vdb.MASK_AND_TWO_INACTIVE_VALS))
    buf.write(struct.pack("<f", 7.0))
    buf.write(struct.pack("<f", 9.0))
    buf.write(np.packbits(sel, bitorder="little").tobytes())
    buf.write(active_vals.astype("<f4").tobytes())
    buf.seek(0)
    out = vdb._read_compressed_values(
        buf, count, value_mask, vdb.COMPRESS_ACTIVE_MASK, 0.0
    )
    np.testing.assert_array_equal(out[value_mask], active_vals)
    assert np.all(out[sel] == 9.0)
    assert np.all(out[~value_mask & ~sel] == 7.0)
