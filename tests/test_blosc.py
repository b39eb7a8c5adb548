"""Blosc1 frame codec tests (data/blosc1.py).

The LZ4 decoder is pinned to the public block spec with hand-built vectors
(literals, matches, overlap copies, length extensions) — not merely to this
repo's own compressor — then frames round-trip across codecs, split modes,
shuffle, and the memcpy fallback.
"""

import numpy as np
import pytest

from deepestscatter_tpu.data import blosc1


# --- LZ4 block spec vectors (hand-assembled per the format doc) -----------


def test_lz4_literals_only():
    # token 0x50: 5 literals, no match (final sequence).
    assert blosc1.lz4_decompress(b"\x50hello", 5) == b"hello"


def test_lz4_simple_match():
    # "abcdabcdefgh": 4 literals "abcd", match offset 4 len 4 -> "abcd",
    # then final literals "efgh".
    block = b"\x40abcd\x04\x00" + b"\x40efgh"
    assert blosc1.lz4_decompress(block, 12) == b"abcdabcdefgh"


def test_lz4_overlap_run():
    # RLE via overlap: 1 literal "a", match offset 1 len 8 => "a"*9,
    # then final literals "bcdef" (spec: block ends with literals).
    block = b"\x14a\x01\x00" + b"\x50bcdef"
    assert blosc1.lz4_decompress(block, 14) == b"a" * 9 + b"bcdef"


def test_lz4_length_extension():
    # 20 literals: token 0xF0 + extension byte 5.
    data = bytes(range(20))
    block = b"\xf0\x05" + data
    assert blosc1.lz4_decompress(block, 20) == data
    # Match length 19+4: token nibble F + ext byte 8 -> 15+8+4 = 27... use
    # offset 1 over "x": 1 literal + 27-byte run + 5 final literals.
    block = b"\x1fx\x01\x00\x08" + b"\x50abcde"
    assert blosc1.lz4_decompress(block, 33) == b"x" * 28 + b"abcde"


def test_lz4_rejects_bad_offset():
    with pytest.raises(blosc1.BloscError):
        blosc1.lz4_decompress(b"\x14a\x00\x00\x50bcdef", 14)  # offset 0
    with pytest.raises(blosc1.BloscError):
        blosc1.lz4_decompress(b"\x14a\x09\x00\x50bcdef", 14)  # before start


def test_lz4_compress_roundtrip():
    rng = np.random.default_rng(0)
    for data in (
        b"",
        b"a",
        b"abcdefghijklmnop" * 100,
        bytes(rng.integers(0, 4, 5000, dtype=np.uint8)),
        bytes(rng.integers(0, 256, 3000, dtype=np.uint8)),
        b"\x00" * 10_000,
    ):
        comp = blosc1.lz4_compress(data)
        assert blosc1.lz4_decompress(comp, len(data)) == data


# --- blosc1 frames --------------------------------------------------------


def _payloads():
    rng = np.random.default_rng(7)
    smooth = np.cumsum(rng.normal(size=4096)).astype(np.float32).tobytes()
    zeros = b"\x00" * 2048
    rand = bytes(rng.integers(0, 256, 2048, dtype=np.uint8))
    small = np.arange(13, dtype=np.float32).tobytes()
    return {"smooth": smooth, "zeros": zeros, "rand": rand, "small": small}


@pytest.mark.parametrize("codec", ["lz4", "zlib", "zstd"])
@pytest.mark.parametrize("split", [True, False])
@pytest.mark.parametrize("shuffle", [True, False])
def test_frame_roundtrip(codec, split, shuffle):
    for name, data in _payloads().items():
        frame = blosc1.compress(
            data, typesize=4, codec=codec, shuffle=shuffle, split=split
        )
        assert blosc1.decompress(frame) == data, (name, codec, split, shuffle)


def test_frame_multiblock_and_leftover():
    rng = np.random.default_rng(3)
    # 3.5 blocks of 1024 bytes: exercises bstarts and the unsplit leftover.
    data = bytes(rng.integers(0, 8, 3584, dtype=np.uint8))
    frame = blosc1.compress(data, typesize=4, blocksize=1024)
    assert blosc1.decompress(frame) == data


def test_frame_memcpy_fallback():
    # Incompressible data with compression disabled by size: the frame
    # must fall back to memcpy and still round-trip.
    rng = np.random.default_rng(5)
    data = bytes(rng.integers(0, 256, 512, dtype=np.uint8))
    frame = blosc1.compress(data, typesize=1, shuffle=False)
    flags = frame[2]
    assert flags & blosc1.FLAG_MEMCPY
    assert blosc1.decompress(frame) == data


def test_frame_rejects_bitshuffle_and_unknown_codec():
    frame = bytearray(blosc1.compress(b"\x00" * 64, typesize=4))
    frame[2] |= blosc1.FLAG_BITSHUFFLE
    with pytest.raises(blosc1.BloscError, match="bit-shuffle"):
        blosc1.decompress(bytes(frame))
    frame = bytearray(blosc1.compress(b"\x01\x02" * 256, typesize=2))
    if not frame[2] & blosc1.FLAG_MEMCPY:
        frame[2] = (frame[2] & 0x1F) | (blosc1.CODEC_SNAPPY << 5)
        with pytest.raises(blosc1.BloscError, match="snappy"):
            blosc1.decompress(bytes(frame))


def test_shuffle_layout():
    """Byte shuffle groups byte planes: plane k holds byte k of each item."""
    data = bytes([0, 1, 2, 3, 10, 11, 12, 13, 20, 21, 22, 23])
    shuffled = blosc1._shuffle(data, 4)
    assert shuffled == bytes([0, 10, 20, 1, 11, 21, 2, 12, 22, 3, 13, 23])
    assert blosc1._unshuffle(shuffled, 4) == data
    # Non-multiple tail stays in place.
    tail = data + b"\xff\xfe"
    assert blosc1._unshuffle(blosc1._shuffle(tail, 4), 4) == tail


def test_truncated_frames_raise_blosc_error():
    """Corrupt/truncated archives must fail with BloscError — the reader's
    error contract — never raw struct.error / IndexError (round-4 ADVICE:
    bstarts and stream headers are bounds-checked, LZ4 length-extension and
    offset reads guard the block end)."""
    rng = np.random.default_rng(11)
    payload = rng.integers(0, 50, 4096, dtype=np.uint8).tobytes()
    frame = blosc1.compress(payload, typesize=4, codec="lz4")
    # Every truncation point of the whole frame fails typed (or, for cuts
    # inside trailing slack, still decodes the full payload).
    for cut in range(0, len(frame), 7):
        try:
            out = blosc1.decompress(frame[:cut])
        except blosc1.BloscError:
            continue
        assert out == payload
    # Bit flips in the header region fail typed or roundtrip-decode.
    for pos in range(0, min(64, len(frame))):
        corrupt = bytearray(frame)
        corrupt[pos] ^= 0xFF
        try:
            out = blosc1.decompress(bytes(corrupt))
        except blosc1.BloscError:
            continue
        except NotImplementedError:
            continue
        assert isinstance(out, bytes)


def test_truncated_lz4_block_raises_typed():
    data = b"abcdefgh" * 64
    block = blosc1.lz4_compress(data)
    for cut in range(len(block)):
        try:
            out = blosc1.lz4_decompress(block[:cut], len(data))
        except blosc1.BloscError:
            continue
        assert out == data
