"""ctypes bindings for the native CPU engine + CSV I/O (built from native/).

Build with ``make -C native`` (g++; no extra deps).  Every entry point has a
pure-Python fallback elsewhere in the package, so the library is optional —
:func:`available` reports whether it loaded.  ``NativeGolden`` mirrors the
GoldenGrid API and is drop-in for full-tile validation at C speed.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB_NAME = "libauvtpu_native.so"
_lib = None


def _try_load():
    global _lib
    if _lib is not None:
        return _lib
    path = os.path.join(os.path.dirname(__file__), _LIB_NAME)
    if not os.path.exists(path):
        # attempt a one-shot build (the toolchain is baked into the image)
        mk = os.path.join(os.path.dirname(__file__), "..", "..", "native")
        if os.path.exists(os.path.join(mk, "Makefile")):
            try:
                subprocess.run(
                    ["make", "-C", mk], check=True, capture_output=True, timeout=300
                )
            except Exception:
                return None
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    dp = ctypes.POINTER(ctypes.c_double)
    for name in ("auv_bilinear", "auv_cubic", "auv_kriging"):
        fn = getattr(lib, name)
        fn.restype = None
        fn.argtypes = [
            dp, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            dp, dp, dp, ctypes.c_int64,
        ]
    lib.auv_csv_read.restype = ctypes.c_void_p
    lib.auv_csv_read.argtypes = [ctypes.c_char_p]
    lib.auv_csv_rows.restype = ctypes.c_int64
    lib.auv_csv_rows.argtypes = [ctypes.c_void_p]
    lib.auv_csv_cols.restype = ctypes.c_int64
    lib.auv_csv_cols.argtypes = [ctypes.c_void_p]
    lib.auv_csv_copy.restype = None
    lib.auv_csv_copy.argtypes = [ctypes.c_void_p, dp]
    lib.auv_csv_free.restype = None
    lib.auv_csv_free.argtypes = [ctypes.c_void_p]
    lib.auv_csv_write.restype = ctypes.c_int
    lib.auv_csv_write.argtypes = [ctypes.c_char_p, dp, ctypes.c_int64, ctypes.c_int64]
    _lib = lib
    return lib


def available() -> bool:
    return _try_load() is not None


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def read_grid_csv(path: str) -> np.ndarray:
    lib = _try_load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    h = lib.auv_csv_read(path.encode())
    if not h:
        raise IOError(f"cannot read {path}")
    try:
        rows = lib.auv_csv_rows(h)
        cols = lib.auv_csv_cols(h)
        out = np.empty((rows, cols), np.float64)
        lib.auv_csv_copy(h, _dptr(out))
    finally:
        lib.auv_csv_free(h)
    return out


def write_grid_csv(path: str, grid: np.ndarray) -> None:
    lib = _try_load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    grid = np.ascontiguousarray(grid, np.float64)
    rc = lib.auv_csv_write(path.encode(), _dptr(grid), grid.shape[0], grid.shape[1])
    if rc != 0:
        raise IOError(f"cannot write {path}")


class NativeGolden:
    """GoldenGrid-compatible facade over the C++ engine (bilinear/cubic/
    kriging with exact reference semantics, multi-threaded over queries)."""

    def __init__(self, elev_nan, min_lon, max_lon, min_lat, max_lat):
        if not available():
            raise RuntimeError("native library unavailable (run `make -C native`)")
        self.elev = np.ascontiguousarray(elev_nan, np.float64)
        self.num_lat, self.num_lon = self.elev.shape
        self.bounds = (float(min_lon), float(max_lon), float(min_lat), float(max_lat))

    def _run(self, fn_name, lons, lats):
        lib = _try_load()
        lons = np.ascontiguousarray(lons, np.float64).ravel()
        lats = np.ascontiguousarray(lats, np.float64).ravel()
        out = np.empty_like(lons)
        getattr(lib, fn_name)(
            _dptr(self.elev), self.num_lat, self.num_lon, *self.bounds,
            _dptr(lons), _dptr(lats), _dptr(out), lons.size,
        )
        return out

    def bilinear(self, lons, lats):
        return self._run("auv_bilinear", lons, lats)

    def cubic(self, lons, lats):
        return self._run("auv_cubic", lons, lats)

    def kriging(self, lons, lats):
        return self._run("auv_kriging", lons, lats)
