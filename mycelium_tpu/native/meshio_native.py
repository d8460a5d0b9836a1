"""ctypes binding for the native mesh-IO library (native/meshio.cpp).

The library is compiled on demand with g++ the first time it is needed and
cached next to the source. Every entry point degrades gracefully: if the
toolchain or the build is unavailable, callers fall back to the numpy
implementations in mycelium_tpu.io.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "meshio.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libmeshio.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SRC):
            return None
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.meshio_read_csv.restype = ctypes.c_int
        lib.meshio_read_csv.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.meshio_free.restype = None
        lib.meshio_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
        lib.meshio_dedup_nodes.restype = ctypes.c_int64
        lib.meshio_dedup_nodes.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.meshio_path_cover.restype = ctypes.c_int
        lib.meshio_path_cover.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.meshio_spanning_forest.restype = ctypes.c_int
        lib.meshio_spanning_forest.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def read_csv(path: str):
    """Parse a numeric CSV (header skipped) -> float64 (rows, cols) array,
    or None if the native path is unavailable/fails."""
    lib = _load()
    if lib is None or not os.path.exists(path):
        return None
    data = ctypes.POINTER(ctypes.c_double)()
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    rc = lib.meshio_read_csv(path.encode(), ctypes.byref(data),
                             ctypes.byref(rows), ctypes.byref(cols))
    if rc != 0:
        return None
    try:
        n = rows.value * cols.value
        out = np.ctypeslib.as_array(data, shape=(n,)).copy()
        return out.reshape(rows.value, cols.value)
    finally:
        lib.meshio_free(data)


def dedup_nodes(pts: np.ndarray, decimals: int = 6):
    """First-appearance dedup of (n,3) points rounded to `decimals`.
    Returns (nodes (m,3), inverse (n,)) or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(pts, dtype=np.float64)
    n = pts.shape[0]
    nodes_out = np.empty((n, 3), dtype=np.float64)
    inv_out = np.empty((n,), dtype=np.int64)
    m = lib.meshio_dedup_nodes(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, decimals,
        nodes_out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        inv_out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if m < 0:
        return None
    return nodes_out[:m].copy(), inv_out


def path_cover(conn: np.ndarray, n_nodes: int):
    """Greedy path cover node ordering (semantics of
    fea.chain.greedy_path_cover). Returns perm (n_nodes,) int64 or None if
    the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    conn = np.ascontiguousarray(conn, dtype=np.int64)
    perm = np.empty((n_nodes,), dtype=np.int64)
    rc = lib.meshio_path_cover(
        conn.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        conn.shape[0], n_nodes,
        perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if rc != 0:
        return None
    return perm


def spanning_forest(conn: np.ndarray, n_nodes: int):
    """Union-find spanning forest in edge order (semantics of
    fea.tree.spanning_forest). Returns (E,) bool or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    conn = np.ascontiguousarray(conn, dtype=np.int64)
    tree = np.empty((conn.shape[0],), dtype=np.uint8)
    rc = lib.meshio_spanning_forest(
        conn.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        conn.shape[0], n_nodes,
        tree.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        return None
    return tree.astype(bool)
