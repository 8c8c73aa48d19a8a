"""ctypes bindings for the native C++ recorder data plane (native/recorder.cpp).

The reference's recorder runtime is native C++ with threaded buffering and
Boost.Asio sockets (ref: core/recorders/data_record.cpp, network_recorder.cpp
:28,128-129); this module loads the equivalent C++17 shared library, compiling
it on first use with g++ (cached next to the source).  All back-ends share the
wire format of reak_tpu.io.recorder (JSON column header + packed float64
rows), so native and Python recorders/extractors interoperate.

Falls back with ImportError if no toolchain is available — callers use
reak_tpu.io.recorder's pure-Python classes then.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "recorder.cpp"))
_SO = os.path.abspath(os.path.join(_NATIVE_DIR, "libreak_recorder.so"))

_lib = None
_lib_lock = threading.Lock()


def _build():
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _SO,
         "-lpthread"],
        check=True, capture_output=True)


def load_library() -> ctypes.CDLL:
    """Load (building if needed) the native recorder library."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.rk_rec_open.restype = ctypes.c_int64
        lib.rk_rec_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.rk_rec_write.restype = ctypes.c_int
        lib.rk_rec_write.argtypes = [ctypes.c_int64,
                                     ctypes.POINTER(ctypes.c_double),
                                     ctypes.c_int64]
        lib.rk_rec_write_batch.restype = ctypes.c_int
        lib.rk_rec_write_batch.argtypes = [ctypes.c_int64,
                                           ctypes.POINTER(ctypes.c_double),
                                           ctypes.c_int64, ctypes.c_int64]
        lib.rk_rec_flush.restype = ctypes.c_int
        lib.rk_rec_flush.argtypes = [ctypes.c_int64]
        lib.rk_rec_close.restype = ctypes.c_int
        lib.rk_rec_close.argtypes = [ctypes.c_int64]
        lib.rk_ext_open.restype = ctypes.c_int64
        lib.rk_ext_open.argtypes = [ctypes.c_char_p]
        lib.rk_ext_ncols.restype = ctypes.c_int64
        lib.rk_ext_ncols.argtypes = [ctypes.c_int64]
        lib.rk_ext_colname.restype = ctypes.c_char_p
        lib.rk_ext_colname.argtypes = [ctypes.c_int64, ctypes.c_int64]
        lib.rk_ext_read.restype = ctypes.c_int
        lib.rk_ext_read.argtypes = [ctypes.c_int64,
                                    ctypes.POINTER(ctypes.c_double)]
        lib.rk_ext_close.restype = ctypes.c_int
        lib.rk_ext_close.argtypes = [ctypes.c_int64]
        lib.rk_rec_last_error.restype = ctypes.c_char_p
        _lib = lib
        return lib


def available() -> bool:
    try:
        load_library()
        return True
    except Exception:
        return False


class NativeRecorder:
    """Named-column row sink on the C++ background-flush thread.

    URIs: ``out.bin``, ``out.csv``, ``tcp://host:port``, ``udp://host:port``
    (the reference's ssv/bin/tcp/udp recorder family)."""

    def __init__(self, uri: str, columns: Sequence[str]):
        self._lib = load_library()
        self.columns = list(columns)
        self._h = self._lib.rk_rec_open(
            uri.encode(), ",".join(self.columns).encode())
        if self._h == 0:
            raise OSError("rk_rec_open failed: "
                          + self._lib.rk_rec_last_error().decode())
        self._n = len(self.columns)

    def record(self, row):
        if isinstance(row, dict):
            row = [row[c] for c in self.columns]
        arr = np.ascontiguousarray(row, dtype=np.float64)
        if arr.size != self._n:
            raise ValueError("row width mismatch")
        rc = self._lib.rk_rec_write(
            self._h, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            self._n)
        if rc != 0:
            raise OSError(self._lib.rk_rec_last_error().decode())

    def record_rows(self, rows):
        """Bulk enqueue: one native call for the whole (K, n) block."""
        arr = np.ascontiguousarray(rows, dtype=np.float64).reshape(-1, self._n)
        rc = self._lib.rk_rec_write_batch(
            self._h, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            arr.shape[0], self._n)
        if rc != 0:
            raise OSError(self._lib.rk_rec_last_error().decode())

    def flush(self):
        self._lib.rk_rec_flush(self._h)

    def close(self):
        if self._h:
            self._lib.rk_rec_close(self._h)
            self._h = 0

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


class NativeExtractor:
    """File-backed row reader (ref: data_extractor >> protocol)."""

    def __init__(self, uri: str):
        self._lib = load_library()
        self._h = self._lib.rk_ext_open(uri.encode())
        if self._h == 0:
            raise OSError("rk_ext_open failed: "
                          + self._lib.rk_rec_last_error().decode())
        n = self._lib.rk_ext_ncols(self._h)
        self.columns = [self._lib.rk_ext_colname(self._h, i).decode()
                        for i in range(n)]
        self._buf = np.zeros(n, np.float64)

    def read_row(self):
        rc = self._lib.rk_ext_read(
            self._h, self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        if rc != 1:
            return None
        return self._buf.copy()

    def read_all(self):
        rows = []
        while (r := self.read_row()) is not None:
            rows.append(r)
        return np.asarray(rows)

    def close(self):
        if self._h:
            self._lib.rk_ext_close(self._h)
            self._h = 0

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()
