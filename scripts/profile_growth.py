"""Per-op growth-step cost breakdown + cell-occupancy census at scale.

Runs a preset to step N on the real device, then times each op of
growth_step separately (R reps chained in one fori_loop dispatch — the
axon relay's ~30 ms RTT makes single-dispatch timing meaningless) and
prints the cell-grid occupancy distribution that sizes the anastomosis
scan (max_per_cell / max_tips_per_cell vs what the state actually holds).

Usage: python -m scripts.profile_growth [preset] [--steps N] [--reps R]
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from mycelium_tpu.bench.growth_scale import PRESETS
from mycelium_tpu.growth.neighbors import (_bucket, _cell_id,
                                           detect_anastomosis, grid_dims)
from mycelium_tpu.growth.ops import enforce_walls, grow, translocate, uptake
from mycelium_tpu.growth.state import ACTIVE, EMPTY
from mycelium_tpu.growth.step import run_growth_chunked
from mycelium_tpu.scenes import petri_dish
from mycelium_tpu.utils import enable_compilation_cache


def time_op(fn, st, reps):
    """Median of 3 trials of `reps` chained applications of fn (ms/op)."""

    def chain(s):
        return jax.lax.fori_loop(0, reps, lambda i, x: fn(x), s)

    jfn = jax.jit(chain)
    out = jfn(st)
    jax.block_until_ready(jax.device_get(out.n_seg))  # value fetch = sync
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = jfn(st)
        jax.device_get(out.n_seg)
        best.append((time.perf_counter() - t0) / reps * 1e3)
    return float(np.median(best))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    name = args[0] if args else "xlarge"
    steps = 120
    reps = 8
    for a in sys.argv[1:]:
        if a.startswith("--steps="):
            steps = int(a.split("=")[1])
        if a.startswith("--reps="):
            reps = int(a.split("=")[1])
    enable_compilation_cache()
    cfg = dataclasses.replace(PRESETS[name], t_steps=steps)
    env = petri_dish(cfg)
    t0 = time.perf_counter()
    st, ea, hist = run_growth_chunked(cfg, env, chunk_steps=10)
    print(f"ran {steps} steps in {time.perf_counter() - t0:.1f} s, "
          f"{hist[-1]['segments']} segments, "
          f"{hist[-1]['active_tips']} active tips", flush=True)

    # ---- occupancy census (host-side; one fetch each)
    g, gz = grid_dims(cfg)
    m_cells = g * g * gz
    alive = np.asarray(jax.device_get(st.state)) != EMPTY
    mid = 0.5 * (np.asarray(jax.device_get(st.start))
                 + np.asarray(jax.device_get(st.end)))
    cell = np.asarray(jax.device_get(_cell_id(jnp.asarray(mid), cfg)))
    occ = np.bincount(cell[alive], minlength=m_cells)
    state_h = np.asarray(jax.device_get(st.state))
    tip = np.asarray(jax.device_get(st.tip))
    n_hyp = int(jax.device_get(st.n_hyp))
    tids = tip[:n_hyp]
    tids = tids[(tids >= 0)]
    tids = tids[state_h[tids] == ACTIVE]
    tend = np.asarray(jax.device_get(st.end))[tids]
    tcell = np.asarray(jax.device_get(_cell_id(jnp.asarray(tend), cfg)))
    tocc = np.bincount(tcell, minlength=m_cells)
    for label, o, cap in (("segments", occ, cfg.max_per_cell),
                          ("tips", tocc, cfg.max_tips_per_cell)):
        nz = o[o > 0]
        print(json.dumps({
            "occupancy": label, "cap": cap,
            "max": int(o.max()), "p99.9": float(np.percentile(nz, 99.9)),
            "p99": float(np.percentile(nz, 99)),
            "mean_nonzero": round(float(nz.mean()), 2),
            "cells_nonzero": int((o > 0).sum()), "cells": m_cells,
        }), flush=True)

    # ---- per-op timing at this state
    key = jax.device_get(st.key)
    ops = {
        "translocate": lambda s: translocate(s, cfg),
        "grow": lambda s: grow(s, cfg, jnp.asarray(key)),
        "anastomose": lambda s: detect_anastomosis(s, cfg),
        "uptake": lambda s: uptake(s, ea, cfg),
        "walls": lambda s: enforce_walls(s, ea, cfg, s.key),
    }
    total = 0.0
    for lbl, fn in ops.items():
        ms = time_op(fn, st, reps)
        total += ms
        print(json.dumps({"op": lbl, "ms_per_step": round(ms, 2)}),
              flush=True)
    print(json.dumps({"op": "TOTAL", "ms_per_step": round(total, 2)}))

    # ---- anastomosis sub-phase: bucketing + pregather alone
    C = cfg.max_per_cell
    N = st.capacity

    def bucket_only(s):
        alive = s.state != EMPTY
        midp = (s.start + s.end) * 0.5
        seg_cell = jnp.where(alive, _cell_id(midp, cfg), m_cells)
        tbl, _, _ = _bucket(jnp.arange(N, dtype=jnp.int32), seg_cell,
                         m_cells, C, sentinel=N)
        # fold the table back into the state so fori can chain it
        return s._replace(overflow=s.overflow | (tbl[0, 0] == -2))

    def pregather(s):
        alive = s.state != EMPTY
        midp = (s.start + s.end) * 0.5
        seg_cell = jnp.where(alive, _cell_id(midp, cfg), m_cells)
        tbl, _, _ = _bucket(jnp.arange(N, dtype=jnp.int32), seg_cell,
                         m_cells, C, sentinel=N)
        sgeo = jnp.concatenate([s.start, s.end], axis=1)
        sgeo_pad = jnp.concatenate(
            [sgeo, jnp.zeros((1, 6), s.start.dtype)], axis=0)
        seg_flat = sgeo_pad[tbl]
        return s._replace(overflow=s.overflow | (seg_flat[0, 0, 0] > 1e30))

    for lbl, fn in (("bucket_only", bucket_only),
                    ("bucket+pregather", pregather)):
        ms = time_op(fn, st, reps)
        print(json.dumps({"op": lbl, "ms_per_step": round(ms, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
