"""Explicit global stiffness assembly (reference component C16).

The production solve path never materializes K — see model.apply_stiffness.
This module provides the explicit forms for cross-checks, spectra, and the
BCOO operator variant: a vmapped (E,6,6) element batch scattered into
static-sparsity COO/BCOO (replacing the reference's per-element Python COO
loop, src/fea_solver.py:74-106, and MatSetValue assembly,
src/fea_petsc.cpp:229-263).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import FeaConfig
from .elements import element_stiffness_batch
from .model import FeaModel


def coo_indices(conn: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Static (E*36,) global row/col indices for the 6x6 element blocks.

    DOF numbering: dof = 3*node + {0,1,2} (src/fea_solver.py:96)."""
    conn = np.asarray(conn)
    dof = np.concatenate([3 * conn[:, :1] + np.arange(3),
                          3 * conn[:, 1:2] + np.arange(3)], axis=1)  # (E,6)
    rows = np.repeat(dof, 6, axis=1)           # (E,36)
    cols = np.tile(dof, (1, 6))                # (E,36)
    return rows.reshape(-1), cols.reshape(-1)


def assemble_coo_values(model: FeaModel, active: jnp.ndarray) -> jnp.ndarray:
    """(E*36,) COO values for the current active mask (indices are static)."""
    ke = element_stiffness_batch(model.geom)               # (E,6,6)
    ke = ke * active[:, None, None].astype(ke.dtype)
    return ke.reshape(-1)


def assemble_bcoo(model: FeaModel, active: jnp.ndarray):
    """jax.experimental.sparse BCOO global stiffness (duplicates summed
    lazily by the matvec)."""
    from jax.experimental import sparse as jsparse
    rows, cols = coo_indices(np.asarray(model.conn))
    idx = jnp.stack([jnp.asarray(rows), jnp.asarray(cols)], axis=1)
    vals = assemble_coo_values(model, active)
    n = model.n_dof
    return jsparse.BCOO((vals, idx), shape=(n, n))


def assemble_scipy(model: FeaModel, active) -> "scipy.sparse.csr_matrix":
    """SciPy CSR assembly — the reference Python path's matrix, used as the
    golden oracle in tests (csr_matrix sums duplicate COO entries exactly
    like src/fea_solver.py:105)."""
    from scipy.sparse import csr_matrix
    rows, cols = coo_indices(np.asarray(model.conn))
    vals = np.asarray(assemble_coo_values(model, jnp.asarray(active)))
    n = model.n_dof
    return csr_matrix((vals, (rows, cols)), shape=(n, n))


def assemble_dense(model: FeaModel, active: jnp.ndarray) -> jnp.ndarray:
    """Dense global K for small meshes (tests/spectra only)."""
    rows, cols = coo_indices(np.asarray(model.conn))
    vals = assemble_coo_values(model, active)
    n = model.n_dof
    flat = jnp.zeros((n * n,), dtype=vals.dtype)
    flat = flat.at[jnp.asarray(rows) * n + jnp.asarray(cols)].add(vals)
    return flat.reshape(n, n)
