"""OpenVDB-subset reader/writer round-trip tests (data/vdb.py) — the
Resources::loadVolumeBuffer ingestion analog (Resources.cpp:68-155)."""

import os

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


@pytest.mark.parametrize("compression", ["zip", "blosc"])
def test_compressed_archive_equals_uncompressed_twin(tmp_path, compression):
    """A blosc-compressed archive (OpenVDB's WITH_BLOSC default layout:
    blosc1 lz4+shuffle frames behind the int64 stream framing) loads
    identically to its uncompressed twin — no pyopenvdb needed
    (reference reads these through the library, Resources.cpp:68-155)."""
    dense = _random_sparse((40, 24, 32), seed=11, density=0.4)
    plain = str(tmp_path / "plain.vdb")
    packed = str(tmp_path / f"{compression}.vdb")
    vdb.write_vdb(plain, vdb.VdbGrid("density", dense, voxel_size=1.5))
    vdb.write_vdb(
        packed, vdb.VdbGrid("density", dense, voxel_size=1.5),
        compression=compression,
    )
    if compression == "blosc":  # compression must actually engage
        assert os.path.getsize(packed) < os.path.getsize(plain)
    a = vdb.read_vdb(plain)[0]
    b = vdb.read_vdb(packed)[0]
    np.testing.assert_array_equal(a.dense, b.dense)
    assert a.bbox_min == b.bbox_min
    assert a.voxel_size == b.voxel_size
    np.testing.assert_array_equal(
        clouds.load_density(plain), clouds.load_density(packed)
    )


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


def _ws(w, s: str):
    import struct

    raw = s.encode()
    w(struct.pack("<I", len(raw)))
    w(raw)


def test_openvdb_style_fixture_archive(tmp_path):
    """Reader parses an archive hand-crafted to OpenVDB's own writer layout
    (io/Archive.cc, io/GridDescriptor.cc, tree/LeafNode.h semantics) —
    INDEPENDENT of this module's writer, so reader/writer can't share an
    omission: instance-parent string + unconditional stream positions in
    the descriptor, UniformScaleMap transform, active-mask+zip compressed
    buffers, and the value mask re-stored before every leaf buffer."""
    import io as _io
    import struct
    import zlib

    rng = np.random.default_rng(42)
    value_mask = rng.random(512) < 0.35
    active_vals = (rng.random(int(value_mask.sum()), dtype=np.float32) + 0.1).astype(
        "<f4"
    )
    voxel_size = 0.73

    def zip_values(vals: np.ndarray) -> bytes:
        payload = vals.astype("<f4").tobytes()
        z = zlib.compress(payload)
        if len(z) < len(payload):
            return struct.pack("<q", len(z)) + z
        return struct.pack("<q", -len(payload)) + payload

    buf = _io.BytesIO()
    w = buf.write
    w(struct.pack("<q", vdb.MAGIC))
    w(struct.pack("<I", 224))
    w(struct.pack("<II", 10, 0))  # library version
    w(struct.pack("<b", 1))  # offsets valid
    w(b"d2f12a60-a0a2-11ee-8c90-0242ac120002"[:36])  # 36-char ascii uuid
    # Archive metamap with one string entry (real files carry "creator").
    w(struct.pack("<I", 1))
    _ws(w, "creator")
    _ws(w, "string")
    creator = b"openvdb 10.0.1"
    w(struct.pack("<I", len(creator)))
    w(creator)
    w(struct.pack("<I", 1))  # grid count

    # GridDescriptor::writeHeader + writeStreamPos.
    _ws(w, "density")
    _ws(w, "Tree_float_5_4_3")
    _ws(w, "")  # instance parent (written since file version 216)
    pos_at = buf.tell()
    w(struct.pack("<qqq", 0, 0, 0))  # patched below
    grid_pos = buf.tell()
    w(struct.pack("<I", vdb.COMPRESS_ZIP | vdb.COMPRESS_ACTIVE_MASK))
    # Grid metamap ("class" like real archives).
    w(struct.pack("<I", 1))
    _ws(w, "class")
    _ws(w, "string")
    cls = b"fog volume"
    w(struct.pack("<I", len(cls)))
    w(cls)
    # Transform: UniformScaleMap = 5 Vec3d, scale values first
    # (math/Maps.h ScaleMap::write order).
    _ws(w, "UniformScaleMap")
    inv = 1.0 / voxel_size
    vecs = np.array(
        [
            [voxel_size] * 3,  # mScaleValues
            [voxel_size] * 3,  # mVoxelSize
            [inv] * 3,  # mScaleValuesInverse
            [inv * inv] * 3,  # mInvScaleSqr
            [0.5 * inv] * 3,  # mInvTwiceScale
        ],
        dtype="<f8",
    )
    w(vecs.tobytes())
    # Tree topology (Tree::writeTopology): one root child at (0,0,0),
    # one lower internal, one leaf at the origin.
    w(struct.pack("<I", 1))  # buffer count
    w(struct.pack("<f", 0.0))  # background
    w(struct.pack("<I", 0))  # root tiles
    w(struct.pack("<I", 1))  # root children
    w(struct.pack("<iii", 0, 0, 0))

    def write_internal_header(n_bits, child_slot):
        child_mask = np.zeros(n_bits, bool)
        child_mask[child_slot] = True
        w(np.packbits(child_mask, bitorder="little").tobytes())
        w(np.packbits(np.zeros(n_bits, bool), bitorder="little").tobytes())
        # readCompressedValues: metadata byte, then zipped values for the
        # ACTIVE slots only (none here).
        w(struct.pack("<b", vdb.NO_MASK_OR_INACTIVE_VALS))
        w(zip_values(np.zeros(0, np.float32)))

    write_internal_header(32**3, 0)  # upper internal, child in slot 0
    write_internal_header(16**3, 0)  # lower internal, leaf in slot 0
    w(np.packbits(value_mask, bitorder="little").tobytes())  # leaf topology

    # Leaf buffers (Tree::writeBuffers → LeafNode::writeBuffers): the value
    # mask is RE-STORED, then the compressed active values.
    block_pos = buf.tell()
    w(np.packbits(value_mask, bitorder="little").tobytes())
    w(struct.pack("<b", vdb.NO_MASK_OR_INACTIVE_VALS))
    w(zip_values(active_vals))

    end_pos = buf.tell()
    buf.seek(pos_at)
    w(struct.pack("<qqq", grid_pos, block_pos, end_pos))
    path = str(tmp_path / "openvdb_style.vdb")
    open(path, "wb").write(buf.getvalue())

    grids = vdb.read_vdb(path)
    assert len(grids) == 1
    g = grids[0]
    assert g.name == "density"
    assert g.voxel_size == pytest.approx(voxel_size)
    assert g.metadata.get("class") == "fog volume"
    assert g.dense.shape == (8, 8, 8)
    # Leaf storage is x-major: values[(x<<6)|(y<<3)|z] → dense[z, y, x].
    expected = np.zeros(512, np.float32)
    expected[value_mask] = active_vals
    expected = expected.reshape(8, 8, 8).transpose(2, 1, 0)
    np.testing.assert_array_equal(g.dense, expected)


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


def test_masked_blosc_compression_read():
    """Reader handles active-mask + BLOSC buffers — the encoding real
    OpenVDB WITH_BLOSC archives use for every node (io::readCompressedValues
    with COMPRESS_ACTIVE_MASK | COMPRESS_BLOSC): metadata byte, then the
    int64-framed blosc frame holding only the active values."""
    import io as _io
    import struct

    from deepestscatter_tpu.data import blosc1

    count = 512
    rng = np.random.default_rng(3)
    value_mask = rng.random(count) < 0.4
    active_vals = np.round(
        rng.random(int(value_mask.sum()), dtype=np.float32), 2
    )
    background = np.float32(0.25)

    frame = blosc1.compress(
        active_vals.astype("<f4").tobytes(), typesize=4, codec="lz4"
    )
    buf = _io.BytesIO()
    buf.write(struct.pack("<b", vdb.NO_MASK_OR_INACTIVE_VALS))
    buf.write(struct.pack("<q", len(frame)))
    buf.write(frame)
    buf.seek(0)
    out = vdb._read_compressed_values(
        buf,
        count,
        value_mask,
        vdb.COMPRESS_BLOSC | vdb.COMPRESS_ACTIVE_MASK,
        float(background),
    )
    np.testing.assert_array_equal(out[value_mask], active_vals)
    np.testing.assert_array_equal(
        out[~value_mask], np.full(int((~value_mask).sum()), background)
    )


@pytest.mark.parametrize("compression", ["none", "zip", "blosc"])
def test_half_float_archive_equals_float_twin(tmp_path, compression):
    """saveFloatAsHalf archives (``_HalfFloat`` type suffix; bulk value
    buffers serialized as 2-byte half, metadata/background still float —
    io::HalfReader wraps only readData) decode to exactly the
    float32-of-half values of their full-precision twin.  Real cloud
    assets are often written half; the reference reads them through the
    library (Resources.cpp:68-155)."""
    dense = _random_sparse((24, 40, 17), seed=23, density=0.35)
    full = str(tmp_path / "full.vdb")
    half = str(tmp_path / "half.vdb")
    vdb.write_vdb(full, vdb.VdbGrid("density", dense, voxel_size=2.0))
    vdb.write_vdb(
        half, vdb.VdbGrid("density", dense, voxel_size=2.0),
        compression=compression, save_float_as_half=True,
    )
    if compression == "none":  # half the bulk bytes
        assert os.path.getsize(half) < os.path.getsize(full)
    a = vdb.read_vdb(full)[0]
    b = vdb.read_vdb(half)[0]
    assert a.dense.dtype == b.dense.dtype == np.float32
    # Exact: every value must be the float32 of its IEEE-half rounding.
    np.testing.assert_array_equal(
        b.dense, a.dense.astype(np.float16).astype(np.float32)
    )
    assert a.bbox_min == b.bbox_min
    assert a.voxel_size == b.voxel_size
    # End-to-end through the cloud loader too (bbox-trimmed like any read).
    np.testing.assert_array_equal(clouds.load_density(half), b.dense)
