"""Capture a jax.profiler trace of the full growth_step at a saved state.

Usage: python -m scripts.trace_growth_step [preset] [--steps=N]
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

import jax

from mycelium_tpu.bench.growth_scale import PRESETS
from mycelium_tpu.growth.step import growth_step, run_growth_chunked
from mycelium_tpu.io.checkpoint import load_growth_state, save_growth_state
from mycelium_tpu.scenes import petri_dish
from mycelium_tpu.growth.state import init_state, EnvArrays
from mycelium_tpu.utils import enable_compilation_cache


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    name = args[0] if args else "xlarge"
    steps = 120
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
        st, ea, _ = run_growth_chunked(cfg, env, chunk_steps=10)
        save_growth_state(path, st)

    if cfg.grid_incremental:
        # checkpoint loads drop the grid cache; catch the backlog up once
        # so the traced steps run the steady-state insert window
        import numpy as np
        from mycelium_tpu.growth.neighbors import grid_insert_finalized
        from mycelium_tpu.growth.state import ensure_grid
        st = ensure_grid(st, cfg)
        grid, _ = jax.jit(grid_insert_finalized,
                          static_argnums=(2,))(st.grid, st, cfg)
        np.asarray(grid.n_seen)
        st = st._replace(grid=grid)

    fn = jax.jit(lambda s: jax.lax.fori_loop(
        0, 4, lambda i, x: growth_step(x, ea, cfg), s))
    out = fn(st)
    jax.device_get(out.n_seg)
    t0 = time.perf_counter()
    out = fn(st)
    jax.device_get(out.n_seg)
    print(f"step: {(time.perf_counter() - t0) / 4 * 1e3:.1f} ms")
    with jax.profiler.trace("/tmp/step_trace"):
        out = fn(st)
        jax.device_get(out.n_seg)
    print("trace written to /tmp/step_trace")


if __name__ == "__main__":
    main()
