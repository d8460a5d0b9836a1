"""Prescribed-displacement boundary conditions (reference component C17).

The reference has two numerically-equivalent BC methods (SURVEY.md §2.5.9):
static condensation onto free DOFs (src/fea_solver.py:112-135) and PETSc's
MatZeroRowsColumnsIS with unit diagonal (src/fea_petsc.cpp:304-320). The
matrix-free equivalent used here is the projected operator

    Â(u) = P·(K·(P·u) + reg·P·u) + (I−P)·u,      P = diag(free_mask)

which acts as K_ff + reg·I on free DOFs and as the identity on prescribed
DOFs — symmetric positive definite, so CG applies. The right-hand side is

    b = −P·K·u_k + (I−P)·u_k

with u_k carrying the prescribed values (grip nodes move (0, ±dy, 0);
src/fea_solver.py:229-242), so the solution carries the prescribed values
exactly, matching both reference methods.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import FeaConfig
from .model import FeaModel, apply_stiffness


def prescribed_values(model: FeaModel, dy_top, dy_bot) -> jnp.ndarray:
    """(N,3) node displacement field holding BC values (zero on free nodes).

    Grip nodes: x and z pinned to 0, y prescribed to ±dy.
    """
    dtype = model.coords.dtype
    uy = (jnp.where(model.top_nodes, jnp.asarray(dy_top, dtype), 0.0)
          + jnp.where(model.bot_nodes, jnp.asarray(dy_bot, dtype), 0.0))
    return jnp.stack([jnp.zeros_like(uy), uy, jnp.zeros_like(uy)], axis=1)


def bc_operator(model: FeaModel, active: jnp.ndarray, cfg: FeaConfig,
                free_nodes: jnp.ndarray | None = None):
    """Returns Â: (N,3) -> (N,3), the SPD boundary-conditioned operator.

    ``free_nodes`` defaults to the grip complement; the ramp driver narrows
    it further by pinning fracture-islanded nodes (see ramp.py) — nodes cut
    off from the grips carry b=0 and an exact zero solution, which a direct
    solver returns exactly but an iterative solver would only approach
    through the reg·I null-space floor.
    """
    free = (model.free_nodes if free_nodes is None else free_nodes)[:, None]
    reg = jnp.asarray(cfg.reg, model.coords.dtype)

    def apply(u_nodes):
        uf = jnp.where(free, u_nodes, 0.0)
        ku = apply_stiffness(model, uf, active, cfg.operator)
        return jnp.where(free, ku + reg * uf, u_nodes)

    return apply


def bc_rhs(model: FeaModel, active: jnp.ndarray, u_k: jnp.ndarray,
           cfg: FeaConfig,
           free_nodes: jnp.ndarray | None = None) -> jnp.ndarray:
    """b = −P·K·u_k + (I−P)·u_k  (external loads are zero in the pull test)."""
    free = (model.free_nodes if free_nodes is None else free_nodes)[:, None]
    ku = apply_stiffness(model, u_k, active, cfg.operator)
    return jnp.where(free, -ku, u_k)
