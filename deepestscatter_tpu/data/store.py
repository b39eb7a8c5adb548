"""Python interface to the native record store.

Capability parity with the reference's Dataset/LmdbDataset duo
(DG/src/Util/Dataset/Dataset.h:25-38, TR/LmdbDataset.py:14-138): typed
tables named after their record type, integer keys, atomic ``batch_append``,
``count``-based resume, and a guarded ``drop_table``.  The storage engine is
the C++ mmap store in ``native/recordstore.cpp`` (built on demand), loaded
through ctypes; batches move as numpy structured arrays with zero
deserialization.

A dataset root holds Train/Validation/Test sub-stores like the reference's
LmdbDatasets triplet (LmdbDataset.py:106-122).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import warnings
from typing import Dict

import numpy as np

from . import records

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "librecordstore.so")
_HASH_PATH = _LIB_PATH + ".srchash"
_lib = None


def _src_hash(src: str) -> str:
    with open(src, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _ensure_built() -> None:
    """Rebuild librecordstore.so only when the SOURCE CONTENT changed.

    Staleness is a content hash stored alongside the .so (mtimes are not
    preserved by git, so a fresh checkout must not trigger an import-time
    rebuild).  If a rebuild fails but a previously built .so exists, fall
    back to it with a warning — the C++ toolchain stays optional whenever
    a valid prebuilt library ships."""
    src = os.path.join(_NATIVE_DIR, "recordstore.cpp")
    want = _src_hash(src)
    have = None
    if os.path.exists(_HASH_PATH):
        with open(_HASH_PATH) as f:
            have = f.read().strip()
    if os.path.exists(_LIB_PATH) and have == want:
        return
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "-B"], check=True, capture_output=True
        )
        with open(_HASH_PATH, "w") as f:
            f.write(want)
    except (subprocess.CalledProcessError, OSError) as e:
        if os.path.exists(_LIB_PATH):
            warnings.warn(
                f"recordstore.cpp changed but rebuild failed ({e}); "
                "falling back to the existing librecordstore.so"
            )
            return
        raise


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    _ensure_built()
    lib = ctypes.CDLL(_LIB_PATH)
    lib.rs_open.restype = ctypes.c_void_p
    lib.rs_open.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
    lib.rs_count.restype = ctypes.c_uint64
    lib.rs_count.argtypes = [ctypes.c_void_p]
    lib.rs_record_size.restype = ctypes.c_uint64
    lib.rs_record_size.argtypes = [ctypes.c_void_p]
    lib.rs_write.restype = ctypes.c_int
    lib.rs_write.argtypes = [
        ctypes.c_void_p,
        ctypes.c_uint64,
        ctypes.c_void_p,
        ctypes.c_uint64,
    ]
    lib.rs_read.restype = ctypes.c_uint64
    lib.rs_read.argtypes = [
        ctypes.c_void_p,
        ctypes.c_uint64,
        ctypes.c_void_p,
        ctypes.c_uint64,
    ]
    lib.rs_gather.restype = ctypes.c_int
    lib.rs_gather.argtypes = [
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_uint64,
    ]
    lib.rs_drop.restype = ctypes.c_int
    lib.rs_drop.argtypes = [ctypes.c_void_p]
    lib.rs_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class Table:
    """One typed table backed by a native mmap file."""

    def __init__(self, path: str, dtype: np.dtype):
        self._lib = _load_lib()
        self.dtype = dtype
        self.path = path
        self._handle = self._lib.rs_open(path.encode(), dtype.itemsize)
        if not self._handle:
            raise OSError(f"failed to open record table {path} (schema change?)")

    def count(self) -> int:
        return int(self._lib.rs_count(self._handle))

    def batch_append(self, start_id: int, batch: np.ndarray) -> None:
        """Write ``batch`` at ids [start_id, start_id + len) atomically
        (the reference's one-transaction batchAppend, Dataset.h:203-232)."""
        batch = np.ascontiguousarray(batch, dtype=self.dtype)
        err = self._lib.rs_write(
            self._handle,
            start_id,
            batch.ctypes.data_as(ctypes.c_void_p),
            len(batch),
        )
        if err != 0:
            raise OSError(f"rs_write failed: errno {-err}")

    def read(self, start_id: int, n: int) -> np.ndarray:
        out = np.empty(n, self.dtype)
        got = self._lib.rs_read(
            self._handle, start_id, out.ctypes.data_as(ctypes.c_void_p), n
        )
        return out[: int(got)]

    def gather(self, ids: np.ndarray) -> np.ndarray:
        """Point-gather records by id — O(len(ids)) regardless of table
        size (the shuffled-batch path; rs_gather in recordstore.cpp).
        Raises on any id beyond the published count."""
        ids = np.ascontiguousarray(ids, dtype=np.uint64)
        out = np.empty(len(ids), self.dtype)
        err = self._lib.rs_gather(
            self._handle,
            ids.ctypes.data_as(ctypes.c_void_p),
            out.ctypes.data_as(ctypes.c_void_p),
            len(ids),
        )
        if err != 0:
            raise IndexError(
                f"rs_gather: id out of range (count={self.count()}) in {self.path}"
            )
        return out

    def get_record(self, record_id: int) -> np.void:
        got = self.read(record_id, 1)
        if len(got) == 0:
            raise KeyError(f"record {record_id} not in {self.path}")
        return got[0]

    def drop(self, confirm: str = "") -> None:
        """Destructive; requires confirm == table name (the reference demands
        a typed confirmation, Dataset.h:110-142)."""
        name = os.path.splitext(os.path.basename(self.path))[0]
        if confirm != name:
            raise PermissionError(
                f"refusing to drop {name}: pass confirm='{name}'"
            )
        self._lib.rs_drop(self._handle)

    def close(self):
        if self._handle:
            self._lib.rs_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class RecordStore:
    """A directory of typed tables (the reference's Dataset over one LMDB
    environment)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._tables: Dict[str, Table] = {}

    def table(self, name: str) -> Table:
        if name not in self._tables:
            dtype = records.SCHEMAS[name]
            self._tables[name] = Table(
                os.path.join(self.root, f"{name}.rec"), dtype
            )
        return self._tables[name]

    def count(self, name: str) -> int:
        return self.table(name).count()

    def close(self):
        for t in self._tables.values():
            t.close()
        self._tables.clear()


class DatasetTriplet:
    """Train/Validation/Test stores under one root
    (LmdbDataset.py LmdbDatasets, :106-122)."""

    def __init__(self, root: str):
        self.root = root
        self.train = RecordStore(os.path.join(root, "Train"))
        self.validation = RecordStore(os.path.join(root, "Validation"))
        self.test = RecordStore(os.path.join(root, "Test"))

    def all(self):
        return {
            "train": self.train,
            "validation": self.validation,
            "test": self.test,
        }
