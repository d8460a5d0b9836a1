"""Pallas kernel for the dense anastomosis distance scan.

The XLA scan in neighbors.detect_anastomosis pairs every tip plane with
every candidate plane over the whole (g, g) cell face, with trip counts
bounded by the GLOBAL max per-cell occupancy. At the xlarge preset that
bound is loose (tips: mean 1.9/cell, max 9; segments: mean 8.5, max 40)
and the chunked while_loops run at ~240 GF/s — each iteration pays
dynamic-slice/update overhead and reduce-root fusions XLA cannot keep in
registers. Measured: ~65 of the 86 ms xlarge anastomose step.

This kernel runs the same scan as ONE launch, banded over face rows:

- grid = (n_bands,) row bands of TB=48 cells; candidate planes are
  DMA'd per plane as (56, CW) windows with an 8-row top halo (the 2x2
  corner window reads row r-1), from arrays stored with 8 zero rows in
  front so every window has a static shape at a band-aligned offset
  (the pallas_factor.py halo-padding idiom — Mosaic cannot lower
  dynamic-size windows);
- per-band occupancy bounds ride in as scalar-prefetch arrays: each
  band loops only over the tip/candidate planes that are actually
  occupied in its rows (plus the one-row halo for candidates);
- the inner pairing is pure VPU elementwise work on (48, CW) faces,
  accumulated into the output blocks in VMEM — no cumsum, no carried
  result planes through roll merges.

The winner per (tip plane, cell) carries (d2, segment parameter tt,
candidate slot id); the projection is recomputed per hypha afterwards,
exactly as the XLA path does. Tie-breaking: within a source, strict-<
accumulation over ascending plane index — identical to the XLA path's
kmin select. Across the 4 window offsets and the 2 sources the loop
NESTING differs from XLA (offsets innermost here, outermost there), so
two DISTINCT candidates at bitwise-equal f32 distance through different
offsets can resolve differently; the reference itself snaps to
dict-iteration order (src/mycelium_sim_2D.py:507-542), so either pick is
within contract.

Kernel path requires gz == 1 (the 2D face layout); 3D configs fall back
to the XLA scan. Numerics per evaluation are op-for-op the XLA
seg_body's (elementwise f32), verified to exact equality in CPU
interpret mode by tests/test_growth_ops.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
TB = 48          # band rows (central)
HALO = 8         # candidate window top halo (>= 1 cell, sublane multiple)
OFFS = ((-1, -1), (-1, 0), (0, -1), (0, 0))


def _scan_kernel(n_slots, GT, CW, tocc_ref, gocc_ref, oocc_ref,
                 tgeo_hbm, tsl_hbm,
                 ggeo_hbm, grr_hbm, gid_hbm,
                 ogeo_hbm, orr_hbm, oid_hbm,
                 d2_out, tt_out, id_out,
                 tgeo_scr, tsl_scr, cgeo_scr, crr_scr, cid_scr, sems):
    b = pl.program_id(0)
    big = jnp.asarray(jnp.inf, jnp.float32)

    d2_out[:] = jnp.full((GT, TB, CW), big, jnp.float32)
    tt_out[:] = jnp.zeros((GT, TB, CW), jnp.float32)
    id_out[:] = jnp.full((GT, TB, CW), n_slots, jnp.int32)

    cp_t = pltpu.make_async_copy(
        tgeo_hbm.at[:, :, pl.ds(b * TB, TB), :], tgeo_scr, sems.at[0])
    cp_s = pltpu.make_async_copy(
        tsl_hbm.at[:, pl.ds(b * TB, TB), :], tsl_scr, sems.at[1])
    cp_t.start()
    cp_s.start()
    cp_t.wait()
    cp_s.wait()

    def source(geo_hbm, rr_hbm, id_hbm, occ):
        def body(kc, _):
            cps = [pltpu.make_async_copy(
                       geo_hbm.at[:, kc, pl.ds(b * TB, TB + HALO), :],
                       cgeo_scr, sems.at[0]),
                   pltpu.make_async_copy(
                       rr_hbm.at[kc, pl.ds(b * TB, TB + HALO), :],
                       crr_scr, sems.at[1]),
                   pltpu.make_async_copy(
                       id_hbm.at[kc, pl.ds(b * TB, TB + HALO), :],
                       cid_scr, sems.at[2])]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()
            geo = cgeo_scr[:]                     # (6, TB+HALO, CW)
            rr_w = crr_scr[:]                     # (TB+HALO, CW)
            id_w = cid_scr[:]
            # col-shifted copies for dc = -1: view[j] = cand[j - 1]
            # (wrapped col 0 reads the right-edge PAD, whose id is the
            # n_slots sentinel -> masked invalid; CW > g always — the
            # host pads at least one full lane column to guarantee it)
            geo_m = pltpu.roll(geo, 1, 2)
            rr_m = pltpu.roll(rr_w, 1, 1)
            id_m = pltpu.roll(id_w, 1, 1)

            views = []
            for dr, dc in OFFS:
                r0 = HALO + dr                    # static row offset
                if dc == 0:
                    views.append((geo[:, r0:r0 + TB, :],
                                  rr_w[r0:r0 + TB, :],
                                  id_w[r0:r0 + TB, :]))
                else:
                    views.append((geo_m[:, r0:r0 + TB, :],
                                  rr_m[r0:r0 + TB, :],
                                  id_m[r0:r0 + TB, :]))

            def tbody(kt, _):
                tp = [tgeo_scr[c, kt] for c in range(3)]      # (TB, CW)
                tsl = tsl_scr[kt]
                bd2 = d2_out[kt]
                btt = tt_out[kt]
                bid = id_out[kt]
                for gv, rv, iv in views:
                    # op-for-op the XLA seg_body distance evaluation
                    ap0 = tp[0] - gv[0]
                    ap1 = tp[1] - gv[1]
                    ap2 = tp[2] - gv[2]
                    apab = ap0 * gv[3] + ap1 * gv[4] + ap2 * gv[5]
                    tt = jnp.clip(apab * rv, 0.0, 1.0)
                    e0 = ap0 - tt * gv[3]
                    e1 = ap1 - tt * gv[4]
                    e2 = ap2 - tt * gv[5]
                    d2 = e0 * e0 + e1 * e1 + e2 * e2
                    inv = (iv == tsl) | (iv >= n_slots)
                    d2 = jnp.where(inv, big, d2)
                    better = d2 < bd2
                    bd2 = jnp.where(better, d2, bd2)
                    btt = jnp.where(better, tt, btt)
                    bid = jnp.where(better, iv, bid)
                d2_out[kt] = bd2
                tt_out[kt] = btt
                id_out[kt] = bid
                return 0

            return lax.fori_loop(0, tocc_ref[b], tbody, 0)

        lax.fori_loop(0, occ, body, 0)

    source(ggeo_hbm, grr_hbm, gid_hbm, gocc_ref[b])
    source(ogeo_hbm, orr_hbm, oid_hbm, oocc_ref[b])


def _pad_cand(planes, rows_pad, cols_pad, fill):
    """(P, g, g) -> (P, HALO + rows_pad, cols_pad) with HALO zero/fill
    rows in front (static band windows) and fill right/bottom."""
    p, g, _ = planes.shape
    return jnp.pad(planes,
                   ((0, 0), (HALO, rows_pad - g), (0, cols_pad - g)),
                   constant_values=fill)


def anast_scan_kernel(tpp, tslot, sources, tip_count_cells,
                      cand_count_cells, n_slots, g,
                      interpret=False):
    """Run the banded distance scan. Arguments:

    - tpp: 3 tip-end component planes, each (GT, g, g)
    - tslot: (GT, g, g) int32 tip segment slots (sentinel n_slots)
    - sources: [(a3, ab3, r, ids), ...] for (grid, overlay) — plane
      arrays (P, g, g), ids int32 with sentinel >= n_slots
    - tip_count_cells: (g, g) int32 tips per corner cell
    - cand_count_cells: [(g, g) int32] per source, candidates per cell
    - returns best (d2, tt, id) as (GT, g, g) arrays
    """
    GT = tslot.shape[0]
    n_bands = -(-g // TB)
    rows_pad = n_bands * TB
    # always at least one pad lane column on the right: the kernel's
    # dc = -1 column roll wraps col 0 into the right edge, and the
    # sentinel-pad invariant (wrapped reads are masked invalid) needs
    # CW > g even when g is an exact multiple of LANE
    CW = (g // LANE + 1) * LANE
    f32 = jnp.float32

    tgeo = jnp.stack([jnp.pad(p.astype(f32),
                              ((0, 0), (0, rows_pad - g), (0, CW - g)))
                      for p in tpp])                       # (3,GT,R,CW)
    tsl_p = jnp.pad(tslot, ((0, 0), (0, rows_pad - g), (0, CW - g)),
                    constant_values=n_slots)

    cands = []
    for a3, ab3, r, ids in sources:
        geo = jnp.stack([x.astype(f32) for x in (*a3, *ab3)], axis=0)
        geo = jnp.pad(geo, ((0, 0), (0, 0), (HALO, rows_pad - g),
                            (0, CW - g)))                  # (6,P,R+H,CW)
        cands.append((geo,
                      _pad_cand(r.astype(f32), rows_pad, CW, 0.0),
                      _pad_cand(ids, rows_pad, CW, n_slots)))
    (ggeo, grr, gid), (ogeo, orr, oid) = cands

    def band_occ(cells, halo_row):
        cp = jnp.pad(cells, ((0, rows_pad - g), (0, 0)))
        if halo_row:
            # candidate windows read row r-1: bound over [band-1, band+TB)
            cp = jnp.maximum(cp, jnp.roll(cp, 1, axis=0))
        return jnp.max(cp.reshape(n_bands, TB, g),
                       axis=(1, 2)).astype(jnp.int32)

    tocc = band_occ(tip_count_cells, False)
    gocc = band_occ(cand_count_cells[0], True)
    oocc = band_occ(cand_count_cells[1], True)

    kernel = functools.partial(_scan_kernel, n_slots, GT, CW)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    outspec = pl.BlockSpec((GT, TB, CW), lambda b, *_: (0, b, 0),
                           memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_bands,),
        in_specs=[anyspec] * 8,
        out_specs=[outspec] * 3,
        scratch_shapes=[
            pltpu.VMEM((3, GT, TB, CW), f32),
            pltpu.VMEM((GT, TB, CW), jnp.int32),
            pltpu.VMEM((6, TB + HALO, CW), f32),
            pltpu.VMEM((TB + HALO, CW), f32),
            pltpu.VMEM((TB + HALO, CW), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((GT, rows_pad, CW), f32),
        jax.ShapeDtypeStruct((GT, rows_pad, CW), f32),
        jax.ShapeDtypeStruct((GT, rows_pad, CW), jnp.int32),
    ]
    d2, tt, ids = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(tocc, gocc, oocc, tgeo, tsl_p, ggeo, grr, gid, ogeo, orr, oid)
    return (d2[:, :g, :g], tt[:, :g, :g], ids[:, :g, :g])
