"""Capture jax.profiler traces of the factorization pieces on the TPU
and print a per-op time breakdown (parsed from the chrome trace JSON).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/trace_factor.py
"""
import glob
import gzip
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

TRACE_DIR = "/tmp/trace_factor"


def summarize(trace_dir, label, top=18):
    files = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz",
                             recursive=True))
    if not files:
        print(f"[{label}] no trace found")
        return
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    durs = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "?")
        durs[name] = durs.get(name, 0.0) + ev.get("dur", 0)
    rows = sorted(durs.items(), key=lambda kv: -kv[1])[:top]
    print(f"--- {label} (total us by op name, top {top})")
    for name, us in rows:
        print(f"  {us/1e3:9.3f} ms  {name[:100]}")


def main(n_target=103000):
    import functools

    import jax
    import jax.numpy as jnp

    from bench import synthetic_mesh
    from mycelium_tpu.config import FeaConfig
    from mycelium_tpu.fea import tree_jax as trj
    from mycelium_tpu.fea.model import build_model
    from mycelium_tpu.fea.pallas_factor import pcr_level_kernel
    from mycelium_tpu.fea.ramp import anchored_mask_host
    from mycelium_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    coords, conn = synthetic_mesh(n_target)
    ext = float(coords[:, 1].max() - coords[:, 1].min())
    cfg = FeaConfig(dtype="float32", rtol=1e-6, warm_start=False,
                    operator="chain", use_pallas=True,
                    precond="tree", tree_coarse_weight=0.25,
                    tree_reg_rel=1e-7, grip_length=0.3 * ext,
                    pallas_vmem_limit_mb=120.0)
    model = build_model(coords, conn, cfg)
    grip = np.asarray(model.top_nodes) | np.asarray(model.bot_nodes)
    anchored = jnp.asarray(anchored_mask_host(
        np.asarray(model.conn), np.ones(model.n_elems, bool), grip))
    active = jnp.ones((model.n_elems,), bool)
    free = jnp.logical_and(model.free_nodes, anchored)
    free_chain = free[model.chain.perm]
    reg = jnp.asarray(1e-2, jnp.float32)

    meta = model.tree.meta
    S0 = meta.level_offsets[1]
    P0 = meta.path_offsets[1]
    steps0 = meta.level_steps[0]
    rng = np.random.default_rng(0)
    D0 = tuple(jnp.asarray(rng.standard_normal(S0), jnp.float32)
               for _ in range(9))
    B0 = tuple(jnp.asarray(rng.standard_normal(S0) * 0.1, jnp.float32)
               for _ in range(9))
    fg0 = model.tree.first_gpos[:P0]
    lg0 = model.tree.last_gpos[:P0]
    jk = jax.jit(functools.partial(pcr_level_kernel, steps=steps0))
    out = jk(D0, B0, fg0, lg0)
    np.asarray(out[2][0][0])          # warm + relay init

    jd = jax.jit(trj.chain_tree_diag)
    Dg = jd(model.tree, model.tree_fast, model.chain, active,
            free_chain, reg)
    np.asarray(Dg[0, 0])

    with jax.profiler.trace(TRACE_DIR + "_kernel"):
        j = jnp.zeros((), jnp.float32)
        for _ in range(8):
            out = jk(tuple(p + j * 1e-30 for p in D0), B0, fg0, lg0)
            j = out[2][0][0]
        np.asarray(j)
    summarize(TRACE_DIR + "_kernel", "pcr_level_kernel x8")

    with jax.profiler.trace(TRACE_DIR + "_diag"):
        j = jnp.zeros((), jnp.float32)
        for _ in range(8):
            Dg = jd(model.tree, model.tree_fast, model.chain, active,
                    free_chain, reg + j * 1e-30)
            j = Dg[0, 0]
        np.asarray(j)
    summarize(TRACE_DIR + "_diag", "chain_tree_diag x8")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 103000)
