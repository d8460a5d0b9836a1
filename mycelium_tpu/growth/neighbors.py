"""Static-shape neighbor search and anastomosis detection.

Replaces the reference's dict-based voxel hash (reference component C8,
src/mycelium_sim_2D.py:465-501; int64-keyed C++ twin
src/mycelium_sim_2D.cpp:185-231) with a DENSE cell grid over the dish:
segments are bucketed into a static (G, G, Gz, C) table (one argsort + one
scatter), and the neighborhood query aligns tip and segment buckets by
ROLLING the small tip planes — on TPU a roll is a cheap relayout while
per-tip window gathers are ~4-25 ns/row serial loops (the previous
sort+searchsorted implementation spent ~110 ms/step in them). Tips are
bucketed by their nearest grid CORNER, which shrinks the exact search
window to the 2x2 cell block around it (see the grid-strategy comment in
detect_anastomosis). Grid wrap-around from the rolls is harmless: wrapped
candidates are physically far, so their true distances never pass the
1e-3 mm tolerance.

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


def _bucket(ids, cell, n_cells, cap, sentinel, want_pos=False):
    """Bucket `ids` (already the item indices) by cell into a dense
    (n_cells, cap) table of item ids; empty slots hold ``sentinel`` (which
    must be out of range for the ID SPACE of ``ids``, not their count).

    ``cell`` must be n_cells for invalid items (they drop out).

    Returns (table, n_dropped, occ_max): items past a cell's capacity are
    silently absent from the table, so callers must surface
    ``n_dropped > 0`` (a dense inoculum cluster or an undersized cap would
    otherwise lose anastomosis candidates undetectably). ``occ_max`` is
    the largest per-cell occupancy actually present (capped at ``cap``) —
    the query loops bound their trip counts with it, so the static cap
    only sets memory, not compute.

    With ``want_pos`` a fourth array is returned: per INPUT position, the
    item's table position ``cell*cap + rank`` (``n_cells*cap`` for items
    that were dropped or invalid) — the inverse map that lets callers pull
    per-item results back out of table-shaped query outputs with a small
    gather instead of scattering through the full table space.
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
    occ_max = jnp.max(jnp.where(valid, rank, -1)).astype(jnp.int32) + 1
    slot = jnp.where(valid, sc * cap + rank, n_cells * cap)
    tbl = jnp.full((n_cells * cap + 1,), sentinel, jnp.int32)
    tbl = tbl.at[slot].set(ids[order], mode="drop")
    out = (tbl[:n_cells * cap].reshape(n_cells, cap), n_dropped, occ_max)
    if want_pos:
        item_pos = jnp.zeros((n,), jnp.int32).at[order].set(
            slot.astype(jnp.int32))
        out = out + (item_pos,)
    return out


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
    seg_tbl, seg_dropped, seg_occ = _bucket(
        jnp.arange(N, dtype=jnp.int32), seg_cell, m_cells, C, sentinel=N)
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
        # Dense-grid query, shaped by four measured rules (the 315 ->
        # ~80 ms/step xlarge rework):
        # 1. CORNER WINDOW: candidates within anastomosis_tol of a tip
        #    have midpoints within reach = (h0+tol)/2 + tol of it, and
        #    reach < voxel/2 — so bucketing TIPS by their nearest grid
        #    CORNER makes the exact search window the 2x2 cell block
        #    around that corner: 4 offsets instead of the reference's 3x3
        #    (falls back to 9 cell-bucketed offsets if a config breaks
        #    the reach bound).
        # 2. Per offset the small TIP planes are rolled, never the
        #    segment geometry (7 planes, 4x larger).
        # 3. All per-item axes are MAJOR dims — planes are (slot, g, g),
        #    so the (8,128) tile lands on the big (g,g) face and chunk
        #    slicing never cuts a lane tile. (Minor dims of 3/64 forced
        #    padded layouts/relayouts costing ~230 ms/step — the same
        #    pathology as the tree-PC block algebra, fea/tree_jax.py.)
        # 4. Trip counts of the chunk loops are bounded by the MEASURED
        #    max occupancy (lax.while_loop with a dynamic bound), so the
        #    static caps C/Ct only size memory: the xlarge state runs
        #    ~40 of 64 segment slots and ~10 of 16 tip slots.
        # The projection point is carried through the scan (one-hot
        # select, pure VPU), so no winner gather/recompute at the end.
        GC = gz * C
        GT = gz * Ct
        # slot-major candidate axis: position = slot*gz + z, so occupied
        # entries form a prefix of length occ*gz in every (x,y) column
        idx_grid = seg_tbl.reshape(g, g, gz, C) \
            .transpose(3, 2, 0, 1).reshape(GC, g, g)
        K = min(16, GC)
        while GC % K:
            K -= 1
        n_sc = jnp.minimum((seg_occ * gz + K - 1) // K,
                           GC // K).astype(jnp.int32)
        # geometry pregather, bounded by occupancy: only occupied chunks
        # are gathered (the full-table gather cost 37 ms/step at xlarge);
        # unvisited chunks stay zero, excluded by the ids>=N mask below
        def pre_body(carry):
            pc, bufs = carry
            ids_c = jax.lax.dynamic_slice_in_dim(idx_grid, pc * K, K,
                                                 axis=0)
            geo = sgeo_pad[ids_c]                             # (K,g,g,6)
            bufs = tuple(
                jax.lax.dynamic_update_slice_in_dim(bufs[k], geo[..., k],
                                                    pc * K, axis=0)
                for k in range(6))
            return pc + 1, bufs

        _, segp_t = jax.lax.while_loop(
            lambda cy_: cy_[0] < n_sc, pre_body,
            (jnp.asarray(0, jnp.int32),
             tuple(jnp.zeros((GC, g, g), dtype) for _ in range(6))))
        segp = list(segp_t)
        # per-candidate precompute (offset-independent since segment
        # planes are never rolled): direction, inverse squared length
        eps_len = jnp.asarray(1e-12, dtype)
        ab = [segp[3 + k] - segp[k] for k in range(3)]
        ab2 = ab[0] * ab[0] + ab[1] * ab[1] + ab[2] * ab[2]
        r_ab2 = jnp.where(ab2 < eps_len, 0.0, 1.0 / jnp.maximum(ab2,
                                                                eps_len))

        reach = (cfg.h0 + cfg.anastomosis_tol) * 0.5 + cfg.anastomosis_tol
        corner_window = reach <= cfg.voxel_size * 0.5
        if corner_window:
            # nearest-corner bucket in x,y (z stays cell-folded)
            c = jnp.floor(tip_end / cfg.voxel_size + 0.5).astype(jnp.int32)
            cx = jnp.clip(c[..., 0] + g // 2, 0, g - 1)
            cy = jnp.clip(c[..., 1] + g // 2, 0, g - 1)
            _, _, cz = cell_coords(tip_end, cfg)
            tip_bucket = (cx * g + cy) * gz + cz
            grid_offs = [(-1, -1), (-1, 0), (0, -1), (0, 0)]
        else:
            tip_bucket = _cell_id(tip_end, cfg)
            grid_offs = offs
        tip_cell = jnp.where(tip_ok, tip_bucket, m_cells)
        tip_tbl, tip_dropped, tip_occ, tip_pos = _bucket(
            t, tip_cell, m_cells, Ct, sentinel=N,
            want_pos=True)                                    # seg slots
        tslot = tip_tbl.reshape(g, g, gz, Ct) \
            .transpose(3, 2, 0, 1).reshape(GT, g, g)
        end_pad = jnp.concatenate([st.end, jnp.zeros((1, 3), dtype)],
                                  axis=0)
        tip_flat = end_pad[jnp.minimum(tslot, N)]             # (GT,g,g,3)
        tpp = [tip_flat[..., k] for k in range(3)]            # (GT,g,g)

        Kt = min(8, GT)
        while GT % Kt:
            Kt -= 1
        n_tc = jnp.minimum((tip_occ * gz + Kt - 1) // Kt,
                           GT // Kt).astype(jnp.int32)

        best_d2 = jnp.full((GT, g, g), big)
        best_p = [jnp.zeros((GT, g, g), dtype) for _ in range(3)]
        for dx, dy in grid_offs:
            # roll tips by +(dx,dy): at grid index m the pair is
            # (tip bucket m-(dx,dy)) vs (segment cell m)
            rtp = [jnp.roll(p, (dx, dy), axis=(1, 2)) for p in tpp]
            rts = jnp.roll(tslot, (dx, dy), axis=(1, 2))

            def seg_body(carry, tpc=None, tsl=None):
                sc, b_d2, b_p0, b_p1, b_p2 = carry
                sl_a = [jax.lax.dynamic_slice_in_dim(segp[k], sc * K, K,
                                                     axis=0)[None]
                        for k in range(3)]                    # (1,K,g,g)
                sl_ab = [jax.lax.dynamic_slice_in_dim(ab[k], sc * K, K,
                                                      axis=0)[None]
                         for k in range(3)]
                sl_r = jax.lax.dynamic_slice_in_dim(r_ab2, sc * K, K,
                                                    axis=0)[None]
                ids = jax.lax.dynamic_slice_in_dim(idx_grid, sc * K, K,
                                                   axis=0)[None]
                ap = [tpc[k][:, None] - sl_a[k] for k in range(3)]
                apab = (ap[0] * sl_ab[0] + ap[1] * sl_ab[1]
                        + ap[2] * sl_ab[2])
                tt = jnp.clip(apab * sl_r, 0.0, 1.0)          # (Kt,K,g,g)
                e = [ap[k] - tt * sl_ab[k] for k in range(3)]
                d2 = e[0] * e[0] + e[1] * e[1] + e[2] * e[2]
                invalid = (ids == tsl[:, None]) | (ids >= N)
                d2 = jnp.where(invalid, big, d2)
                dmin = jnp.min(d2, axis=1)                    # (Kt,g,g)
                # first-match one-hot select of the projection — no gather
                hit = d2 <= dmin[:, None]
                first = jnp.logical_and(hit, jnp.cumsum(hit, axis=1) == 1)
                fw = first.astype(dtype)
                pj = [jnp.sum((sl_a[k] + tt * sl_ab[k]) * fw, axis=1)
                      for k in range(3)]
                better = dmin < b_d2
                return (sc + 1,
                        jnp.where(better, dmin, b_d2),
                        jnp.where(better, pj[0], b_p0),
                        jnp.where(better, pj[1], b_p1),
                        jnp.where(better, pj[2], b_p2))

            def tip_body(carry):
                tc, d2b, p0b, p1b, p2b = carry
                tpc = [jax.lax.dynamic_slice_in_dim(p, tc * Kt, Kt, axis=0)
                       for p in rtp]                          # (Kt,g,g)
                tsl = jax.lax.dynamic_slice_in_dim(rts, tc * Kt, Kt,
                                                   axis=0)
                init = (jnp.asarray(0, n_sc.dtype),
                        jnp.full((Kt, g, g), big),
                        jnp.zeros((Kt, g, g), dtype),
                        jnp.zeros((Kt, g, g), dtype),
                        jnp.zeros((Kt, g, g), dtype))
                _, bd2, bp0, bp1, bp2 = jax.lax.while_loop(
                    lambda cy_: cy_[0] < n_sc,
                    lambda cy_: seg_body(cy_, tpc=tpc, tsl=tsl), init)
                upd = jax.lax.dynamic_update_slice_in_dim
                return (tc + 1, upd(d2b, bd2, tc * Kt, axis=0),
                        upd(p0b, bp0, tc * Kt, axis=0),
                        upd(p1b, bp1, tc * Kt, axis=0),
                        upd(p2b, bp2, tc * Kt, axis=0))

            o_init = (jnp.asarray(0, n_tc.dtype), jnp.full((GT, g, g), big),
                      jnp.zeros((GT, g, g), dtype),
                      jnp.zeros((GT, g, g), dtype),
                      jnp.zeros((GT, g, g), dtype))
            _, od2, op0, op1, op2 = jax.lax.while_loop(
                lambda cy_: cy_[0] < n_tc, tip_body, o_init)
            # roll results back to unrolled tip-bucket space and merge
            od2 = jnp.roll(od2, (-dx, -dy), axis=(1, 2))
            op = [jnp.roll(p, (-dx, -dy), axis=(1, 2))
                  for p in (op0, op1, op2)]
            better = od2 < best_d2
            best_d2 = jnp.where(better, od2, best_d2)
            best_p = [jnp.where(better, op[k], best_p[k]) for k in range(3)]

        # ---- pull per-HYPHA results out of the table space: the results
        # live in (GT,g,g) planes, but scattering snaps through that 2M-
        # entry space cost 107 ms/step at xlarge (a f32[...,3] scatter is
        # ~46 ns/row); four H-row gathers + H-row scatters cost ~25 ms.
        # Flat plane index of hypha h's tip: tip_pos = cell*Ct + rank with
        # cell = (cx*g + cy)*gz + cz  ->  ((rank*gz + cz)*g + cx)*g + cy.
        cell_h = tip_pos // Ct
        rank_h = tip_pos - cell_h * Ct
        cz_h = cell_h % gz
        cxy_h = cell_h // gz
        pos_h = (rank_h * gz + cz_h) * (g * g) + cxy_h
        in_tbl = tip_pos < m_cells * Ct
        pos_c = jnp.minimum(pos_h, GT * g * g - 1)
        d_h = jnp.sqrt(best_d2.reshape(-1)[pos_c])            # (H,)
        proj_h = jnp.stack([p.reshape(-1)[pos_c] for p in best_p],
                           axis=-1)                           # (H, 3)
        flat_slot = jnp.where(in_tbl & tip_ok, t, N)
        flat_d = jnp.where(in_tbl, d_h, big)
        flat_proj = proj_h
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

    # ---- scatter snaps back to tip segment slots (per coordinate plane:
    # a width-3 f32 row scatter costs ~3x the three scalar ones)
    idx = jnp.where(snap, flat_slot, N)
    end = jnp.stack(
        [st.end[:, k].at[idx].set(flat_proj[:, k], mode="drop")
         for k in range(3)], axis=1)
    state = st.state.at[idx].set(ANASTOMOSED, mode="drop")
    # cell-capacity overflow dropped candidates from the query: surface it
    # through the same flag as slot-capacity exhaustion (drivers warn)
    return st._replace(end=end, state=state,
                       overflow=st.overflow | (n_dropped > 0))
