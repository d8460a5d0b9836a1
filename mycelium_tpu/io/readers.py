"""Mesh readers: the nodes.csv / elements.csv interchange contract.

Input contract matches reference src/fea_petsc.cpp:42-82 and
src/fea_solver.py:193-196: ``nodes.csv`` has columns (node_id,x,y,z) and
``elements.csv`` has (elem_id,n1,n2). Like the C++ readers (fea_petsc.cpp:241)
elements referencing out-of-range node ids are skipped rather than crashing
(the results/test_X_cpp_2 fixture exercises this).

A native C++ fast-path (native/meshio.cpp) is used when its shared library
has been built; the numpy path is the fallback and the semantics oracle.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np


def _read_csv_numeric(path: str) -> np.ndarray:
    """Parse a simple numeric CSV with a header row into a float64 array."""
    from ..native import meshio_native
    if meshio_native.available():
        arr = meshio_native.read_csv(path)
        if arr is not None:
            return arr
    return np.loadtxt(path, delimiter=",", skiprows=1, ndmin=2,
                      dtype=np.float64)


def read_mesh(nodes_path: str, elems_path: str
              ) -> Tuple[np.ndarray, np.ndarray]:
    """Load (coords (n,3) float64, conn (e,2) int32) from the CSV contract."""
    nodes = _read_csv_numeric(nodes_path)
    elems = _read_csv_numeric(elems_path)
    if nodes.size == 0:
        raise ValueError(f"empty nodes file: {nodes_path}")
    n_nodes = nodes.shape[0]
    # node_id column is positional in both reference readers; coords follow it
    coords = np.ascontiguousarray(nodes[:, 1:4], dtype=np.float64)
    if elems.size == 0:
        conn = np.zeros((0, 2), dtype=np.int32)
    else:
        conn = elems[:, 1:3].astype(np.int64)
        # drop out-of-range references like the C++ reader (fea_petsc.cpp:241)
        ok = ((conn >= 0) & (conn < n_nodes)).all(axis=1)
        conn = conn[ok].astype(np.int32)
    return coords, conn


def read_mesh_dir(results_dir: str) -> Tuple[np.ndarray, np.ndarray]:
    """Load a mesh from a results/sim_* style directory."""
    return read_mesh(os.path.join(results_dir, "nodes.csv"),
                     os.path.join(results_dir, "elements.csv"))
