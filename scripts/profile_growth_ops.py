"""Per-op growth-step cost breakdown at a saved xlarge-class state.

Times each op (translocate/grow/anastomose/uptake/walls) as its own
fori-chained jit program, plus the fused full step. Reuses the cached
state file of scripts/bench_anastomosis.py.

Usage: python -m scripts.profile_growth_ops [preset] [--steps=N] [--reps=R]
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

import jax
import numpy as np

from mycelium_tpu.bench.growth_scale import PRESETS
from mycelium_tpu.growth.neighbors import detect_anastomosis
from mycelium_tpu.growth.ops import (enforce_walls, grow, translocate,
                                     uptake)
from mycelium_tpu.growth.state import init_state
from mycelium_tpu.growth.step import growth_step, run_growth_chunked
from mycelium_tpu.io.checkpoint import load_growth_state, save_growth_state
from mycelium_tpu.scenes import petri_dish
from mycelium_tpu.utils import enable_compilation_cache


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    name = args[0] if args else "xlarge"
    steps, reps = 120, 4
    for a in sys.argv[1:]:
        if a.startswith("--steps="):
            steps = int(a.split("=")[1])
        if a.startswith("--reps="):
            reps = int(a.split("=")[1])
    enable_compilation_cache()
    cfg = dataclasses.replace(PRESETS[name], t_steps=steps)
    env = petri_dish(cfg)
    path = f"/tmp/anast_state_{name}_{steps}.npz"
    _, ea = init_state(cfg, env)
    if os.path.exists(path):
        st = load_growth_state(path)
        print(f"loaded {path}", flush=True)
    else:
        t0 = time.perf_counter()
        st, ea2, hist = run_growth_chunked(cfg, env, chunk_steps=10)
        print(f"grew {steps} steps in {time.perf_counter() - t0:.1f} s, "
              f"{hist[-1]['segments']} segments", flush=True)
        save_growth_state(path, st)
    print(f"n_seg {int(np.asarray(st.n_seg))} "
          f"n_hyp {int(np.asarray(st.n_hyp))}", flush=True)

    if cfg.grid_incremental:
        # checkpoint loads drop the grid cache (io/checkpoint.py); attach
        # an empty grid and run the whole-backlog insert ONCE here so the
        # timed anastomose/full_step calls measure the steady state (their
        # per-call insert window [n_seen, n_seg) is then empty — real
        # steps insert ~n_grown segments, a few ms at most)
        from mycelium_tpu.growth.neighbors import grid_insert_finalized
        from mycelium_tpu.growth.state import ensure_grid
        st = ensure_grid(st, cfg)
        t0 = time.perf_counter()
        grid, dropped = jax.jit(grid_insert_finalized,
                                static_argnums=(2,))(st.grid, st, cfg)
        np.asarray(grid.n_seen)
        st = st._replace(grid=grid)
        print(f"grid backlog insert {time.perf_counter() - t0:.1f} s "
              f"(occ {int(np.asarray(grid.occ))}, "
              f"dropped {bool(np.asarray(dropped))})", flush=True)

    ops = {
        "translocate": lambda s: translocate(s, cfg),
        "grow": lambda s: grow(s, cfg, s.key),
        "anastomose": lambda s: detect_anastomosis(s, cfg),
        "uptake": lambda s: uptake(s, ea, cfg),
        "walls": lambda s: enforce_walls(s, ea, cfg, s.key),
        "full_step": lambda s: growth_step(s, ea, cfg),
    }
    for opname, f in ops.items():
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
        print(f"{opname:12s} {np.median(ts) * 1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
