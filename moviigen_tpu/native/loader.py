"""ctypes bindings for the native async cache reader
(``src/cache_loader.cpp``) + an .npy batch reader built on it.

The shared library builds on first use with the system toolchain and is
cached next to the source; environments without a compiler fall back to
Python I/O transparently (``native_available()``).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "src", "cache_loader.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "src", "libcache_loader.so")
_lib = None
_lib_lock = threading.Lock()


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-pthread",
             "-o", _LIB, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        logging.warning("native cache loader build failed: %s", e)
        return False


def _load():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB) or \
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _lib = False
                return _lib
        try:
            lib = ctypes.CDLL(_LIB)
            lib.clp_create.restype = ctypes.c_void_p
            lib.clp_create.argtypes = [ctypes.c_int]
            lib.clp_submit.restype = ctypes.c_int64
            lib.clp_submit.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_void_p,
                ctypes.c_uint64, ctypes.c_uint64]
            lib.clp_wait.restype = ctypes.c_int64
            lib.clp_wait.argtypes = [ctypes.c_void_p, ctypes.c_int64]
            lib.clp_destroy.argtypes = [ctypes.c_void_p]
            _lib = lib
        except OSError as e:
            logging.warning("native cache loader unavailable: %s", e)
            _lib = False
    return _lib


def native_available() -> bool:
    return bool(_load())


class NativeReaderPool:
    """Thread pool performing file reads outside the GIL."""

    def __init__(self, num_threads: int = 4):
        lib = _load()
        if not lib:
            raise RuntimeError("native cache loader unavailable")
        self._lib = lib
        self._pool = lib.clp_create(num_threads)

    def submit(self, path: str, dst: np.ndarray, offset: int = 0) -> int:
        """Async read of ``dst.nbytes`` bytes at ``offset`` into ``dst``
        (must be C-contiguous and kept alive until wait)."""
        assert dst.flags["C_CONTIGUOUS"]
        ticket = self._lib.clp_submit(
            self._pool, path.encode(), dst.ctypes.data_as(ctypes.c_void_p),
            offset, dst.nbytes)
        if ticket < 0:
            raise RuntimeError(f"submit failed for {path}")
        return ticket

    def wait(self, ticket: int) -> int:
        n = self._lib.clp_wait(self._pool, ticket)
        if n < 0:
            raise IOError(f"native read failed (code {n})")
        return n

    def close(self):
        if self._pool:
            self._lib.clp_destroy(self._pool)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def _npy_header(path: str) -> Tuple[np.dtype, tuple, int, bool]:
    """Parse an .npy header: (dtype, shape, payload_offset, fortran)."""
    with open(path, "rb") as f:
        magic = f.read(6)
        if magic != b"\x93NUMPY":
            raise ValueError(f"not an npy file: {path}")
        major, _minor = f.read(2)
        if major == 1:
            hlen = int.from_bytes(f.read(2), "little")
        else:
            hlen = int.from_bytes(f.read(4), "little")
        header = f.read(hlen).decode("latin1")
        d = eval(header, {"__builtins__": {}},
                 {"False": False, "True": True})  # npy header is a dict lit
        offset = f.tell()
    return (np.dtype(d["descr"]), tuple(d["shape"]), offset,
            d["fortran_order"])


def read_npy_batch(pool: NativeReaderPool,
                   paths: Sequence[str]) -> List[np.ndarray]:
    """Read many .npy files concurrently through the native pool."""
    arrays, tickets = [], []
    for p in paths:
        dtype, shape, offset, fortran = _npy_header(p)
        if fortran:
            raise ValueError(f"fortran-order npy unsupported: {p}")
        arr = np.empty(shape, dtype)
        tickets.append(pool.submit(p, arr, offset))
        arrays.append(arr)
    for t, p, a in zip(tickets, paths, arrays):
        n = pool.wait(t)
        if n != a.nbytes:
            raise IOError(f"short read {n}/{a.nbytes} for {p}")
    return arrays
