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
        _i8 = ctypes.POINTER(ctypes.c_int8)
        _u8 = ctypes.POINTER(ctypes.c_uint8)
        _i32 = ctypes.POINTER(ctypes.c_int32)
        _i64 = ctypes.POINTER(ctypes.c_int64)
        lib.meshio_tree_peel.restype = ctypes.c_int
        lib.meshio_tree_peel.argtypes = [
            _i64, ctypes.c_int64, ctypes.c_int64,   # conn, n_elems, n_nodes
            _u8, _u8, ctypes.c_int64,               # tree_edge, free, mpl
            _i32, _u8, _i8, _i32, _u8,              # slot arrays
            _i32, _i32, _i8, _i32, _u8, _i32, _i32, _i32,   # path arrays
            ctypes.c_int64, _i64, _i64,             # max_levels, offsets
            _i64, _i64,                             # n_levels, n_fill
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


def tree_peel(conn: np.ndarray, n_nodes: int, tree_edge: np.ndarray,
              free: np.ndarray, max_path_len: int, max_levels: int = 64):
    """Native tree-elimination schedule peel (exact semantics of
    fea.tree.build_tree_schedule's python walk — tested against it).
    Returns a list of per-level dicts (the TreeLevel field arrays, minus
    att_level/att_pos patching which is included) plus n_fill, or None if
    the native library is unavailable or the peel fails."""
    lib = _load()
    if lib is None:
        return None
    conn = np.ascontiguousarray(conn, dtype=np.int64)
    tree_edge = np.ascontiguousarray(tree_edge, dtype=np.uint8)
    free = np.ascontiguousarray(free, dtype=np.uint8)
    n = int(n_nodes)
    i8 = ctypes.POINTER(ctypes.c_int8)
    u8 = ctypes.POINTER(ctypes.c_uint8)
    i32 = ctypes.POINTER(ctypes.c_int32)
    i64 = ctypes.POINTER(ctypes.c_int64)

    def arr(shape, dt):
        return np.empty(shape, dtype=dt)

    slots = arr(n, np.int32)
    path_start = arr(n, np.uint8)
    left_kind = arr(n, np.int8)
    left_id = arr(n, np.int32)
    left_flip = arr(n, np.uint8)
    first_pos = arr(n, np.int32)
    last_pos = arr(n, np.int32)
    att_kind = np.zeros((n, 2), np.int8)
    att_id = np.zeros((n, 2), np.int32)
    att_flip = np.zeros((n, 2), np.uint8)
    att_level = np.zeros((n, 2), np.int32)
    att_pos = np.zeros((n, 2), np.int32)
    fill_out = arr(n, np.int32)
    slot_off = arr(max_levels + 1, np.int64)
    path_off = arr(max_levels + 1, np.int64)
    n_levels = ctypes.c_int64()
    n_fill = ctypes.c_int64()

    def p(a, t):
        return a.ctypes.data_as(t)

    rc = lib.meshio_tree_peel(
        p(conn, i64), conn.shape[0], n,
        p(tree_edge, u8), p(free, u8), int(max_path_len),
        p(slots, i32), p(path_start, u8), p(left_kind, i8),
        p(left_id, i32), p(left_flip, u8),
        p(first_pos, i32), p(last_pos, i32),
        p(att_kind, i8), p(att_id, i32), p(att_flip, u8),
        p(att_level, i32), p(att_pos, i32), p(fill_out, i32),
        int(max_levels), p(slot_off, i64), p(path_off, i64),
        ctypes.byref(n_levels), ctypes.byref(n_fill))
    if rc != 0:
        return None
    levels = []
    for li in range(int(n_levels.value)):
        s0, s1 = int(slot_off[li]), int(slot_off[li + 1])
        p0, p1 = int(path_off[li]), int(path_off[li + 1])
        levels.append(dict(
            slots=slots[s0:s1].copy(),
            path_start=path_start[s0:s1].astype(bool),
            left_kind=left_kind[s0:s1].copy(),
            left_id=left_id[s0:s1].copy(),
            left_flip=left_flip[s0:s1].astype(bool),
            first_pos=first_pos[p0:p1].copy(),
            last_pos=last_pos[p0:p1].copy(),
            att_kind=att_kind[p0:p1].copy(),
            att_id=att_id[p0:p1].copy(),
            att_flip=att_flip[p0:p1].astype(bool),
            att_level=att_level[p0:p1].copy(),
            att_pos=att_pos[p0:p1].copy(),
            fill_out=fill_out[p0:p1].copy(),
        ))
    return levels, int(n_fill.value)


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
