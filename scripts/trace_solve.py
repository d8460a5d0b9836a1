"""Device-side trace of the 309k hybrid solve: chained cold solves and
the PC-apply chain, with per-op device-time attribution parsed from the
chrome trace. Everything data-dependent is inside jit (host eager ops
through the axon tunnel cost ~1 ms each and poison wall-clock probes).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/trace_solve.py
"""
import glob
import gzip
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def device_summary(trace_dir, label, n_calls, top=20):
    files = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz",
                             recursive=True))
    data = json.load(gzip.open(files[-1], "rt"))
    meta = {e["pid"]: e["args"].get("name") for e in data["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pid = next(p for p, n in meta.items() if "TPU" in str(n))
    durs, cnts = {}, {}
    for e in data["traceEvents"]:
        if e.get("ph") == "X" and e.get("pid") == dev_pid:
            durs[e["name"]] = durs.get(e["name"], 0) + e.get("dur", 0)
            cnts[e["name"]] = cnts.get(e["name"], 0) + 1
    print(f"--- {label}: per-call device ms (/{n_calls}), top {top}")
    for n, us in sorted(durs.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {us/1e3/n_calls:9.4f} ms x{cnts[n]//n_calls:4d}  {n[:90]}")


def main(n_target=103000):
    import jax
    import jax.numpy as jnp

    from bench import synthetic_mesh
    from mycelium_tpu.config import FeaConfig
    from mycelium_tpu.fea.model import build_model
    from mycelium_tpu.fea.ramp import anchored_mask_host
    from mycelium_tpu.fea.solve import compute_tree_factor, \
        solve_displacement
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
    x0 = jnp.zeros((model.n_nodes, 3), jnp.float32)
    dy = jnp.asarray(0.02, jnp.float32)

    @jax.jit
    def one_solve(model, active, anchored, xc):
        act = active & jnp.isfinite(xc[0, 0])
        res = solve_displacement(model, act, dy, -dy, xc * 1e-30, cfg,
                                 anchored)
        return res.x, res.iters

    xc, it = one_solve(model, active, anchored, x0)
    np.asarray(xc[0, 0])
    # clean wall clock: K async dispatches, one fetch
    for k in (8,):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            xc2 = x0
            for _ in range(k):
                xc2, it = one_solve(model, active, anchored, xc2)
            np.asarray(xc2[0, 0])
            ts.append((time.perf_counter() - t0) / k)
        print(f"cold_solve wall (k={k}): {np.median(ts)*1e3:.2f} ms "
              f"iters {int(it)}", flush=True)

    with jax.profiler.trace("/tmp/trace_cold"):
        xc2 = x0
        for _ in range(8):
            xc2, it = one_solve(model, active, anchored, xc2)
        np.asarray(xc2[0, 0])
    device_summary("/tmp/trace_cold", "cold solve x8", 8)

    # PC apply chain (in-jit scan; subtract nothing — report span)
    fac = jax.jit(compute_tree_factor, static_argnums=(2,))(
        model, active, cfg, anchored)
    from mycelium_tpu.fea.tree_jax import tree_apply_chain

    @jax.jit
    def pc_chain(r, fac):
        def body(c, _):
            return tree_apply_chain(model.tree, fac, c), None
        out, _ = jax.lax.scan(body, r, None, length=16)
        return out

    r0 = jnp.asarray(np.random.default_rng(1).standard_normal(
        (model.n_nodes, 3)), jnp.float32)
    out = pc_chain(r0, fac)
    np.asarray(out[0, 0])
    with jax.profiler.trace("/tmp/trace_pc"):
        out = pc_chain(r0, fac)
        np.asarray(out[0, 0])
    device_summary("/tmp/trace_pc", "pc apply x16", 16)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 103000)
