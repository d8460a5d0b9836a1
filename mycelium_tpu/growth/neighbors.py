"""Static-shape neighbor search and anastomosis detection.

Replaces the reference's dict-based voxel hash (reference component C8,
src/mycelium_sim_2D.py:465-501; int64-keyed C++ twin
src/mycelium_sim_2D.cpp:185-231) with a DENSE cell grid over the dish:
segments are bucketed into a static (G, G, Gz, C) table (one argsort + one
scatter), and the 3x3(x3) neighborhood is formed by ROLLING the whole
table — on TPU a roll is a cheap relayout while per-tip window gathers are
~4-25 ns/row serial loops (the previous sort+searchsorted implementation
spent ~110 ms/step in them; this one runs the same query in a few ms).
Grid wrap-around from the rolls is harmless: wrapped candidates are
physically far, so their true distances never pass the 1e-3 mm tolerance.

Anastomosis (C9, src/mycelium_sim_2D.py:507-542): an active tip whose
endpoint comes within tol of any other segment snaps to the closest point
on that segment and becomes 'S' (it stops growing forever). Like the
reference, the query runs against the post-growth segment set, indexes
midpoints only (the voxel size 0.1 is 2x the segment length, so the 3x3
neighborhood is safe), and excludes only the tip itself. Deviations (both
documented): we snap to the NEAREST candidate rather than the first in
dict-bucket order, and cells hold at most C segments / Ct tips (overflow
drops candidates; the defaults are ~10x the mean occupancy).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GrowthConfig
from .state import ACTIVE, ANASTOMOSED, EMPTY, GrowthState

def grid_dims(cfg: GrowthConfig):
    """Static grid extents: the dish plus margin for wall-leaked tips;
    out-of-range coordinates clip into the border cells."""
    g = int(np.ceil(cfg.dish_size / cfg.voxel_size)) + 4
    if cfg.three_d:
        gz = int(np.ceil((cfg.height + 2 * cfg.wall_thickness)
                         / cfg.voxel_size)) + 3
    else:
        gz = 1
    return g, gz


def cell_coords(p, cfg: GrowthConfig):
    """(..., 3) positions -> clipped integer cell coords (cx, cy, cz)."""
    g, gz = grid_dims(cfg)
    c = jnp.floor(p / cfg.voxel_size).astype(jnp.int32)
    cx = jnp.clip(c[..., 0] + g // 2, 0, g - 1)
    cy = jnp.clip(c[..., 1] + g // 2, 0, g - 1)
    cz = jnp.clip(c[..., 2] + gz // 2, 0, gz - 1)
    return cx, cy, cz


def _cell_id(p, cfg):
    g, gz = grid_dims(cfg)
    cx, cy, cz = cell_coords(p, cfg)
    return (cx * g + cy) * gz + cz


def _bucket(ids, cell, n_cells, cap, sentinel):
    """Bucket `ids` (already the item indices) by cell into a dense
    (n_cells, cap) table of item ids; empty slots hold ``sentinel`` (which
    must be out of range for the ID SPACE of ``ids``, not their count).

    ``cell`` must be n_cells for invalid items (they drop out).

    Returns (table, n_dropped): items past a cell's capacity are silently
    absent from the table, so callers must surface ``n_dropped > 0`` (a
    dense inoculum cluster or an undersized cap would otherwise lose
    anastomosis candidates undetectably).
    """
    n = ids.shape[0]
    key = jnp.where(cell < n_cells, cell, n_cells)
    order = jnp.argsort(key)
    sc = key[order]
    # first-occurrence index of each run in the sorted keys via cummax
    # (searchsorted costs ~2x an argsort on TPU; this is one scan)
    pos = jnp.arange(n, dtype=jnp.int32)
    run_start = jnp.concatenate([jnp.ones((1,), bool), sc[1:] != sc[:-1]])
    first = jax.lax.cummax(jnp.where(run_start, pos, 0))
    rank = pos - first
    in_range = sc < n_cells
    valid = in_range & (rank < cap)
    n_dropped = jnp.sum(in_range & (rank >= cap))
    slot = jnp.where(valid, sc * cap + rank, n_cells * cap)
    tbl = jnp.full((n_cells * cap + 1,), sentinel, jnp.int32)
    tbl = tbl.at[slot].set(ids[order], mode="drop")
    return tbl[:n_cells * cap].reshape(n_cells, cap), n_dropped


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


def detect_anastomosis(st: GrowthState, cfg: GrowthConfig,
                       strategy: str | None = None) -> GrowthState:
    """Snap active tips onto nearby segments.

    Two query strategies over the same dense cell table (identical
    candidate sets -> identical snaps up to distance ties):
    - 'grid' (TPU default): roll the whole table for each neighbor offset;
      distances are computed for every cell whether or not it holds tips —
      wasteful in FLOPs but gather-free, which is what TPU wants;
    - 'window' (CPU default): gather each tip's 9 neighbor-cell windows —
      ~6x fewer distance evaluations, fine on CPU where gathers are cheap.
    """
    import jax as _jax
    if strategy is None:
        strategy = "window" if _jax.default_backend() == "cpu" else "grid"
    N, H = st.capacity, st.tip.shape[0]
    C = cfg.max_per_cell
    Ct = cfg.max_tips_per_cell
    g, gz = grid_dims(cfg)
    m_cells = g * g * gz
    dtype = st.start.dtype

    # ---- segment table: bucket by midpoint cell, gather packed geometry.
    # The z dimension is folded into the candidate axis (the z extent is a
    # couple of cells), so a query covers the full z column of each of the
    # 3x3 xy-neighbor cells — a superset of the reference's 3x3x3 query.
    alive = st.state != EMPTY
    mid = (st.start + st.end) * 0.5
    seg_cell = jnp.where(alive, _cell_id(mid, cfg), m_cells)
    seg_tbl, seg_dropped = _bucket(jnp.arange(N, dtype=jnp.int32), seg_cell,
                                   m_cells, C, sentinel=N)
    sgeo = jnp.concatenate([st.start, st.end], axis=1)        # (N, 6)
    sgeo_pad = jnp.concatenate([sgeo, jnp.zeros((1, 6), dtype)], axis=0)

    hyp_ids = jnp.arange(H, dtype=jnp.int32)
    t = jnp.maximum(st.tip, 0)
    tip_ok = (hyp_ids < st.n_hyp) & (st.tip >= 0) & (st.state[t] == ACTIVE)
    tip_end = st.end[t]                                       # (H, 3)

    big = jnp.asarray(jnp.inf, dtype)
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]

    def fold_offset(best, d, proj, cand_idx, self_slot):
        invalid = (cand_idx == self_slot) | (cand_idx >= N)
        d = jnp.where(invalid, big, d)
        dmin = jnp.min(d, axis=-1)
        # first-match one-hot select of the projection (take_along_axis
        # would be another per-row gather; this stays pure VPU)
        hit = d <= dmin[..., None]
        first = jnp.logical_and(hit, jnp.cumsum(hit, axis=-1) == 1)
        pmin = jnp.sum(proj * first[..., None].astype(proj.dtype), axis=-2)
        best_d, best_proj = best
        better = dmin < best_d
        return (jnp.where(better, dmin, best_d),
                jnp.where(better[..., None], pmin, best_proj))

    if strategy == "grid":
        # Tips are bucketed onto the same grid; per neighbor offset the
        # SEGMENT grid (geometry + ids) is rolled against the static tip
        # table. The inner loop scans the candidate axis in chunks with a
        # carried fused min/argmin, computing only squared distances.
        # All geometry lives in COMPONENT PLANES — separate (g,g,GC)
        # arrays per coordinate — so every temporary in the distance
        # formula is a scalar (g,g,GT,K) broadcast: the packed (...,3)
        # form's minor vector dim forced padded layouts/relayouts that
        # cost ~230 ms/step of the xlarge anastomosis (measured; the
        # same pathology as the tree-PC block algebra, fea/tree_jax.py).
        GC = gz * C
        GT = gz * Ct
        seg_flat = sgeo_pad[seg_tbl]                          # (cells, C, 6)
        segp = [seg_flat[..., k].reshape(g, g, GC) for k in range(6)]
        idx_grid = seg_tbl.reshape(g, g, GC)
        tip_cell = jnp.where(tip_ok, _cell_id(tip_end, cfg), m_cells)
        tip_tbl, tip_dropped = _bucket(t, tip_cell, m_cells, Ct,  # seg slots
                                       sentinel=N)
        end_pad = jnp.concatenate([st.end, jnp.zeros((1, 3), dtype)],
                                  axis=0)
        tip_flat = end_pad[jnp.minimum(tip_tbl, N)]           # (cells,Ct,3)
        tpp = [tip_flat[..., k].reshape(g, g, GT)[:, :, :, None]
               for k in range(3)]                             # (g,g,GT,1)
        tslot = tip_tbl.reshape(g, g, GT)

        best_d2 = jnp.full((g, g, GT), big)
        best_off = jnp.zeros((g, g, GT), jnp.int32)
        best_k = jnp.zeros((g, g, GT), jnp.int32)
        # candidate axis processed in chunks of K inside a scan: the
        # working set per step is (g,g,GT,K) ~ a few tens of MB instead of
        # (g,g,GT,GC) temporaries in the 100s of MB, which the fusion
        # can keep on-chip
        K = min(16, GC)
        while GC % K:
            K -= 1
        eps_len = jnp.asarray(1e-12, dtype)
        for oi, (dx, dy) in enumerate(offs):
            nb = [jnp.roll(p, (-dx, -dy), axis=(0, 1)) for p in segp]
            nbid = jnp.roll(idx_grid, (-dx, -dy), axis=(0, 1))

            def chunk_body(carry, c, nb=nb, nbid=nbid, oi=oi):
                b_d2, b_off, b_k = carry
                sl = [jax.lax.dynamic_slice_in_dim(p, c * K, K, axis=2)
                      [:, :, None, :] for p in nb]            # (g,g,1,K)
                ids = jax.lax.dynamic_slice_in_dim(nbid, c * K, K, axis=2)
                ab = [sl[3 + k] - sl[k] for k in range(3)]
                ap = [tpp[k] - sl[k] for k in range(3)]
                ab2 = ab[0] * ab[0] + ab[1] * ab[1] + ab[2] * ab[2]
                apab = ap[0] * ab[0] + ap[1] * ab[1] + ap[2] * ab[2]
                tt = apab / jnp.where(ab2 < eps_len, 1.0, ab2)
                tt = jnp.where(ab2 < eps_len, 0.0,
                               jnp.clip(tt, 0.0, 1.0))
                d2 = sum((ap[k] - tt * ab[k]) ** 2
                         for k in range(3))                   # (g,g,GT,K)
                invalid = (ids[:, :, None, :] == tslot[..., None]) \
                    | (ids[:, :, None, :] >= N)
                d2 = jnp.where(invalid, big, d2)
                dmin = jnp.min(d2, axis=-1)
                kmin = (jnp.argmin(d2, axis=-1).astype(jnp.int32) + c * K)
                better = dmin < b_d2
                return (jnp.where(better, dmin, b_d2),
                        jnp.where(better, oi, b_off),
                        jnp.where(better, kmin, b_k)), None

            (best_d2, best_off, best_k), _ = jax.lax.scan(
                chunk_body, (best_d2, best_off, best_k),
                jnp.arange(GC // K, dtype=jnp.int32))

        # winner's global segment id: candidate best_k in the neighbor
        # cell picked by best_off (small per-tip-slot gathers)
        dxs = jnp.asarray([o[0] for o in offs], jnp.int32)
        dys = jnp.asarray([o[1] for o in offs], jnp.int32)
        gi = jnp.arange(g, dtype=jnp.int32)
        ci = (gi[:, None, None] + dxs[best_off]) % g
        cj = (gi[None, :, None] + dys[best_off]) % g
        win_id = idx_grid[ci, cj, best_k]                     # (g,g,GT)
        geo = sgeo_pad[jnp.minimum(win_id, N)]
        tpos = tip_flat.reshape(g, g, GT, 3)
        _, proj = point_segment_distance(tpos, geo[..., 0:3], geo[..., 3:6])
        flat_slot = tslot.reshape(-1)
        flat_d = jnp.sqrt(best_d2).reshape(-1)
        flat_proj = proj.reshape(-1, 3)
        snap = (flat_slot < N) & (flat_d <= cfg.anastomosis_tol)
        n_dropped = seg_dropped + tip_dropped
    else:
        # per-tip windows gathered from the dense table (CPU-friendly)
        tbl_cols = seg_tbl.reshape(g * g, gz * C)
        cx, cy, _ = cell_coords(tip_end, cfg)
        best = (jnp.full((H,), big), jnp.zeros((H, 3), dtype))
        for dx, dy in offs:
            nx = jnp.clip(cx + dx, 0, g - 1)
            ny = jnp.clip(cy + dy, 0, g - 1)
            cand = tbl_cols[nx * g + ny]                      # (H, gz*C)
            geo = sgeo_pad[cand]                              # (H, gz*C, 6)
            d, proj = point_segment_distance(
                tip_end[:, None, :], geo[..., 0:3], geo[..., 3:6])
            best = fold_offset(best, d, proj, cand, t[:, None])
        flat_slot = jnp.where(tip_ok, t, N)
        flat_d = best[0]
        flat_proj = best[1]
        snap = tip_ok & (flat_d <= cfg.anastomosis_tol)
        n_dropped = seg_dropped

    # ---- scatter snaps back to tip segment slots
    idx = jnp.where(snap, flat_slot, N)
    end = st.end.at[idx].set(flat_proj, mode="drop")
    state = st.state.at[idx].set(ANASTOMOSED, mode="drop")
    # cell-capacity overflow dropped candidates from the query: surface it
    # through the same flag as slot-capacity exhaustion (drivers warn)
    return st._replace(end=end, state=state,
                       overflow=st.overflow | (n_dropped > 0))
