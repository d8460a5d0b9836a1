"""Micro-bench / trace harness for detect_anastomosis at a saved state.

First run grows the preset to --steps and saves the state next to /tmp;
subsequent runs load it (seconds, not minutes) and time the op. Pass
--trace to dump a jax.profiler trace of a few executions.

Usage: python -m scripts.bench_anastomosis [preset] [--steps=N] [--reps=R]
       [--trace=/tmp/anast_trace]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from mycelium_tpu.bench.growth_scale import PRESETS
from mycelium_tpu.growth.neighbors import detect_anastomosis
from mycelium_tpu.growth.step import run_growth_chunked
from mycelium_tpu.io.checkpoint import (load_growth_state,
                                        save_growth_state)
from mycelium_tpu.scenes import petri_dish
from mycelium_tpu.utils import enable_compilation_cache


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    name = args[0] if args else "xlarge"
    steps, reps, trace, strat = 120, 4, None, None
    for a in sys.argv[1:]:
        if a.startswith("--steps="):
            steps = int(a.split("=")[1])
        if a.startswith("--reps="):
            reps = int(a.split("=")[1])
        if a.startswith("--trace="):
            trace = a.split("=")[1]
        if a.startswith("--strategy="):
            strat = a.split("=")[1]
    enable_compilation_cache()
    cfg = dataclasses.replace(PRESETS[name], t_steps=steps)
    path = f"/tmp/anast_state_{name}_{steps}.npz"
    if os.path.exists(path):
        st = load_growth_state(path)
        print(f"loaded {path}", flush=True)
    else:
        env = petri_dish(cfg)
        t0 = time.perf_counter()
        st, _, hist = run_growth_chunked(cfg, env, chunk_steps=10)
        print(f"grew {steps} steps in {time.perf_counter() - t0:.1f} s, "
              f"{hist[-1]['segments']} segments", flush=True)
        save_growth_state(path, st)

    fn = jax.jit(lambda s: jax.lax.fori_loop(
        0, reps, lambda i, x: detect_anastomosis(x, cfg, strategy=strat), s))
    out = fn(st)
    jax.device_get(out.n_seg)   # sync + relay warm-up
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(st)
        jax.device_get(out.n_seg)
        times.append((time.perf_counter() - t0) / reps * 1e3)
    print(json.dumps({"op": "anastomose",
                      "ms": round(float(np.median(times)), 2)}), flush=True)
    if trace:
        with jax.profiler.trace(trace):
            out = fn(st)
            jax.device_get(out.n_seg)
        print(f"trace written to {trace}")


if __name__ == "__main__":
    main()
