"""Per-piece cost of the incremental anastomosis query at a saved
xlarge-class state: steady-state grid insert, tip-overlay build
(bucket + geometry pregather), tip-table build, and (by remainder vs
profile_growth_ops' anastomose row) the distance scans.

Usage: python -m scripts.profile_anast_pieces [preset] [--steps=N]
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from mycelium_tpu.bench.growth_scale import PRESETS
from mycelium_tpu.growth.neighbors import (_bucket, _cell_id, grid_dims,
                                           grid_insert_finalized)
from mycelium_tpu.growth.state import ensure_grid, init_state
from mycelium_tpu.growth.step import run_growth_chunked
from mycelium_tpu.io.checkpoint import load_growth_state, save_growth_state
from mycelium_tpu.scenes import petri_dish
from mycelium_tpu.utils import enable_compilation_cache


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    name = args[0] if args else "xlarge"
    steps, reps = 120, 8
    for a in sys.argv[1:]:
        if a.startswith("--steps="):
            steps = int(a.split("=")[1])
    enable_compilation_cache()
    cfg = dataclasses.replace(PRESETS[name], t_steps=steps)
    env = petri_dish(cfg)
    path = f"/tmp/anast_state_{name}_{steps}.npz"
    _, ea = init_state(cfg, env)
    if os.path.exists(path):
        st = load_growth_state(path)
    else:
        st, _, _ = run_growth_chunked(cfg, env, chunk_steps=10)
        save_growth_state(path, st)
    st = ensure_grid(st, cfg)
    grid, _ = jax.jit(grid_insert_finalized,
                      static_argnums=(2,))(st.grid, st, cfg)
    np.asarray(grid.n_seen)
    st = st._replace(grid=grid)
    print(f"n_seg {int(np.asarray(st.n_seg))}", flush=True)

    N, H = st.capacity, st.tip.shape[0]
    C, Ct = cfg.max_per_cell, cfg.max_tips_per_cell
    g, gz = grid_dims(cfg)
    m_cells = g * g * gz
    dtype = st.start.dtype
    GO = gz * C
    GT = gz * Ct

    def insert_only(s):
        gr, _ = grid_insert_finalized(s.grid, s, cfg)
        return s._replace(grid=gr._replace(n_seen=s.grid.n_seen))

    def overlay_bucket(s):
        hyp_ids = jnp.arange(H, dtype=jnp.int32)
        t = jnp.maximum(s.tip, 0)
        sgeo = jnp.concatenate([s.start, s.end], axis=1)
        tge = sgeo[t]
        tip_seg_ok = (hyp_ids < s.n_hyp) & (s.tip >= 0)
        mid_t = (tge[:, 0:3] + tge[:, 3:6]) * 0.5
        ov_cell = jnp.where(tip_seg_ok, _cell_id(mid_t, cfg), m_cells)
        ov_tbl, _, ov_occ = _bucket(t, ov_cell, m_cells, C, sentinel=N)
        ov_ids = ov_tbl.reshape(g, g, gz, C) \
            .transpose(3, 2, 0, 1).reshape(GO, g, g)
        # fold results back into state so jit can't DCE the work
        return s._replace(sub=s.sub.at[0].add(
            jnp.sum(ov_ids[:, 0, 0].astype(dtype)) * 0 +
            ov_occ.astype(dtype) * 0))

    def overlay_pregather(s):
        """bucket + the occupancy-bounded geometry pregather of
        gather_source (neighbors.py)."""
        hyp_ids = jnp.arange(H, dtype=jnp.int32)
        t = jnp.maximum(s.tip, 0)
        sgeo = jnp.concatenate([s.start, s.end], axis=1)
        sgeo_pad = jnp.concatenate([sgeo, jnp.zeros((1, 6), dtype)], axis=0)
        tge = sgeo[t]
        tip_seg_ok = (hyp_ids < s.n_hyp) & (s.tip >= 0)
        mid_t = (tge[:, 0:3] + tge[:, 3:6]) * 0.5
        ov_cell = jnp.where(tip_seg_ok, _cell_id(mid_t, cfg), m_cells)
        ov_tbl, _, ov_occ = _bucket(t, ov_cell, m_cells, C, sentinel=N)
        ov_ids = ov_tbl.reshape(g, g, gz, C) \
            .transpose(3, 2, 0, 1).reshape(GO, g, g)
        K = 16
        n_sc = jnp.minimum((ov_occ * gz + K - 1) // K, GO // K) \
            .astype(jnp.int32)

        def pre_body(carry):
            pc, bufs = carry
            ids_c = jax.lax.dynamic_slice_in_dim(ov_ids, pc * K, K, axis=0)
            geo = sgeo_pad[ids_c]
            bufs = tuple(
                jax.lax.dynamic_update_slice_in_dim(
                    bufs[k], geo[..., k], pc * K, axis=0)
                for k in range(6))
            return pc + 1, bufs

        _, segp = jax.lax.while_loop(
            lambda c: c[0] < n_sc, pre_body,
            (jnp.asarray(0, jnp.int32),
             tuple(jnp.zeros((GO, g, g), dtype) for _ in range(6))))
        acc = sum(jnp.sum(p[:, 0, 0]) for p in segp)
        return s._replace(sub=s.sub.at[0].add(acc * 0))

    def tip_table(s):
        hyp_ids = jnp.arange(H, dtype=jnp.int32)
        t = jnp.maximum(s.tip, 0)
        from mycelium_tpu.growth.state import ACTIVE
        tip_ok = (hyp_ids < s.n_hyp) & (s.tip >= 0) \
            & (s.state[t] == ACTIVE)
        end_pad = jnp.concatenate([s.end, jnp.zeros((1, 3), dtype)], axis=0)
        tip_end = s.end[t]
        c = jnp.floor(tip_end / cfg.voxel_size + 0.5).astype(jnp.int32)
        cx = jnp.clip(c[..., 0] + g // 2, 0, g - 1)
        cy = jnp.clip(c[..., 1] + g // 2, 0, g - 1)
        cz = jnp.zeros_like(cx)
        tip_bucket = (cx * g + cy) * gz + cz
        tip_cell = jnp.where(tip_ok, tip_bucket, m_cells)
        tip_tbl, _, tip_occ, tip_pos = _bucket(
            t, tip_cell, m_cells, Ct, sentinel=N, want_pos=True)
        tslot = tip_tbl.reshape(g, g, gz, Ct) \
            .transpose(3, 2, 0, 1).reshape(GT, g, g)
        tip_flat = end_pad[jnp.minimum(tslot, N)]
        acc = jnp.sum(tip_flat[:, 0, 0]) + tip_occ.astype(dtype) * 0
        return s._replace(sub=s.sub.at[0].add(acc * 0))

    pieces = {
        "insert_steady": insert_only,
        "overlay_bucket": overlay_bucket,
        "overlay_pregather": overlay_pregather,
        "tip_table": tip_table,
    }
    for nm, f in pieces.items():
        fn = jax.jit(lambda s, f=f: jax.lax.fori_loop(
            0, reps, lambda i, x: f(x), s))
        out = fn(st)
        np.asarray(out.n_seg)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(st)
            np.asarray(out.n_seg)
            ts.append((time.perf_counter() - t0) / reps)
        print(f"{nm:18s} {np.median(ts) * 1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
