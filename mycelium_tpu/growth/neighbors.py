"""Static-shape neighbor search and anastomosis detection.

Replaces the reference's dict-based voxel hash (reference component C8,
src/mycelium_sim_2D.py:465-501; int64-keyed C++ twin
src/mycelium_sim_2D.cpp:185-231) with a sort-based cell list: segment
midpoints are binned into voxel cells, slots are argsorted by packed cell
key, and each query gathers a fixed-size window per neighboring cell via
searchsorted — all shapes static, everything inside jit.

Anastomosis (C9, src/mycelium_sim_2D.py:507-542): an active tip whose
endpoint comes within tol of any other segment snaps to the closest point
on that segment and becomes 'S' (it stops growing forever). Like the
reference, the query runs against the post-growth segment set, indexes
midpoints only (a 3x3x3 neighborhood around the tip — safe because the
voxel size 0.1 is 2x the segment length), and excludes only the tip itself.
Deviation: the reference takes the *first* candidate within tol in dict
iteration order; we take the *nearest* (ties broken by lowest slot), which
is deterministic and order-independent under data parallelism.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import GrowthConfig
from .state import ACTIVE, ANASTOMOSED, EMPTY, GrowthState

_BITS = 10          # cells per axis in [-512, 511], packed into int32
_OFF = 1 << (_BITS - 1)


def cell_coords(p, voxel):
    """Integer voxel coordinates, floor semantics matching the reference's
    `int(p // voxel)` (mycelium_sim_2D.py:470-475). Coordinates are clipped
    to the packable range — ample for the walled petri-dish domain (±2.5 mm
    at voxel 0.1 -> ±26 cells of the ±512 budget)."""
    c = jnp.floor(p / voxel).astype(jnp.int32)
    return jnp.clip(c, -_OFF, _OFF - 1)


def pack_cells(c):
    """(..., 3) int cell coords -> packed int32 key (no x64 requirement)."""
    return (((c[..., 0] + _OFF) << (2 * _BITS))
            | ((c[..., 1] + _OFF) << _BITS)
            | (c[..., 2] + _OFF))


def build_cell_index(st: GrowthState, cfg: GrowthConfig):
    """Sort all alive segments by the packed cell key of their midpoint.

    Returns (sorted_keys (N,), order (N,)): empty slots sort to the end
    with a sentinel key.
    """
    mid = (st.start + st.end) * 0.5
    keys = pack_cells(cell_coords(mid, cfg.voxel_size))
    keys = jnp.where(st.state != EMPTY, keys, jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(keys)
    return keys[order], order


def _neighbor_offsets(three_d: bool):
    rng = (-1, 0, 1)
    if three_d:
        return [(dx, dy, dz) for dx in rng for dy in rng for dz in rng]
    # 2D: all z coordinates are 0 -> single z cell
    return [(dx, dy, 0) for dx in rng for dy in rng]

def point_segment_distance(p, a, b):
    """Batched point-to-segment distance + closest point
    (mycelium_sim_2D.py:114-128). p,a,b: (...,3)."""
    ap = p - a
    ab = b - a
    ab2 = jnp.sum(ab * ab, axis=-1)
    t = jnp.sum(ap * ab, axis=-1) / jnp.where(ab2 < 1e-12, 1.0, ab2)
    t = jnp.where(ab2 < 1e-12, 0.0, jnp.clip(t, 0.0, 1.0))
    proj = a + t[..., None] * ab
    dist = jnp.linalg.norm(p - proj, axis=-1)
    return dist, proj


def detect_anastomosis(st: GrowthState, cfg: GrowthConfig) -> GrowthState:
    """Snap active tips onto nearby segments (vectorized over all tips)."""
    N, H = st.capacity, st.tip.shape[0]
    C = cfg.max_per_cell
    sorted_keys, order = build_cell_index(st, cfg)

    hyp_ids = jnp.arange(H, dtype=jnp.int32)
    hyp_valid = (hyp_ids < st.n_hyp) & (st.tip >= 0)
    t = jnp.maximum(st.tip, 0)
    is_tip_active = hyp_valid & (st.state[t] == ACTIVE)
    p = st.end[t]                                     # (H,3) tip endpoints

    center = cell_coords(p, cfg.voxel_size)           # (H,3)
    offs = jnp.asarray(_neighbor_offsets(cfg.three_d), jnp.int32)  # (Q,3)
    q_keys = pack_cells(center[:, None, :] + offs[None, :, :])     # (H,Q)
    lo = jnp.searchsorted(sorted_keys, q_keys, side="left")        # (H,Q)
    hi = jnp.searchsorted(sorted_keys, q_keys, side="right")

    j = jnp.arange(C)                                  # (C,)
    cand_pos = lo[:, :, None] + j[None, None, :]       # (H,Q,C)
    cand_ok = cand_pos < hi[:, :, None]
    cand_pos = jnp.minimum(cand_pos, N - 1)
    cand = order[cand_pos]                             # (H,Q,C) slot ids

    a = st.start[cand]                                 # (H,Q,C,3)
    b = st.end[cand]
    dist, proj = point_segment_distance(p[:, None, None, :], a, b)

    # exclude the tip segment itself (reference skips only (hi, tip_idx))
    invalid = (~cand_ok) | (cand == t[:, None, None])
    big = jnp.asarray(jnp.inf, dist.dtype)
    dist = jnp.where(invalid, big, dist)

    dist_flat = dist.reshape(H, -1)
    best = jnp.argmin(dist_flat, axis=1)               # lowest index wins ties
    best_dist = jnp.take_along_axis(dist_flat, best[:, None], axis=1)[:, 0]
    proj_flat = proj.reshape(H, -1, 3)
    best_proj = jnp.take_along_axis(proj_flat, best[:, None, None],
                                    axis=1)[:, 0, :]

    snap = is_tip_active & (best_dist <= cfg.anastomosis_tol)
    idx = jnp.where(snap, t, N)
    end = st.end.at[idx].set(best_proj, mode="drop")
    state = st.state.at[idx].set(ANASTOMOSED, mode="drop")
    return st._replace(end=end, state=state)
