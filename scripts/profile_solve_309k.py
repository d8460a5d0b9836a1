"""Break the 309k-DOF hybrid cold solve into measured pieces on the TPU.

Times (chained-in-one-dispatch where meaningful):
  - full cold solve (factorization inside)              [the headline]
  - compute_tree_factor alone
  - the dense-tail linalg.inv alone at the same dim
  - tree_apply_chain (PC apply) alone
  - matvec kernel alone
  - CG with a precomputed factor (warm-factor solve)
Prints the tree level structure so the PCR/dense-tail split can be chosen.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_solve_309k.py \
         [n_nodes] [--tail=N] [--coarse=N]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timeit(fn, sync, k=8, reps=3):
    fn()  # compile / warm
    sync()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(k):
            fn()
        sync()
        ts.append((time.perf_counter() - t0) / k)
    return float(np.median(ts)) * 1e3


def main(n_target=103000, tail=None, coarse=None):
    import jax
    import jax.numpy as jnp

    from mycelium_tpu.config import FeaConfig
    from mycelium_tpu.fea.model import build_model
    from mycelium_tpu.fea.ramp import anchored_mask_host
    from mycelium_tpu.fea.solve import compute_tree_factor, solve_displacement
    from mycelium_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from bench import synthetic_mesh

    coords, conn = synthetic_mesh(n_target)
    ext = float(coords[:, 1].max() - coords[:, 1].min())
    kw = {}
    if tail is not None:
        kw["tree_dense_tail"] = tail
    if coarse is not None:
        kw["coarse_max_dim"] = coarse
    cfg = FeaConfig(dtype="float32", rtol=1e-6, warm_start=False,
                    operator="chain",
                    use_pallas=jax.default_backend() != "cpu",
                    precond="tree", tree_coarse_weight=0.25,
                    tree_reg_rel=1e-7, grip_length=0.3 * ext,
                    pallas_vmem_limit_mb=120.0, **kw)
    t0 = time.time()
    model = build_model(coords, conn, cfg)
    print(f"build {time.time() - t0:.1f}s  nodes {model.n_nodes} "
          f"mode {'single' if model.tree_packed is not None else 'hybrid' if getattr(model, 'tree_packed_big', None) else 'xla'}",
          flush=True)
    meta = model.tree.meta
    sizes = [meta.level_offsets[i + 1] - meta.level_offsets[i]
             for i in range(len(meta.level_offsets) - 1)]
    n_pcr = meta.n_pcr if meta.n_pcr >= 0 else len(sizes)
    tail_slots = sum(sizes[n_pcr:])
    print(f"levels {sizes}  n_pcr {n_pcr}  tail_slots {tail_slots} "
          f"(dense dim {3 * tail_slots})  steps {meta.level_steps}",
          flush=True)

    grip = np.asarray(model.top_nodes) | np.asarray(model.bot_nodes)
    anchored = jnp.asarray(anchored_mask_host(
        np.asarray(model.conn), np.ones(model.n_elems, bool), grip))
    active = jnp.ones((model.n_elems,), bool)
    x0 = jnp.zeros((model.n_nodes, 3), jnp.float32)
    dy = jnp.asarray(0.02, jnp.float32)

    def sync_via(x):
        return lambda: np.asarray(x[0] if hasattr(x[0], "shape") else x[0])

    # --- full cold solve, chained
    state = {}

    @jax.jit
    def one_solve(model, act, anchored, xc):
        res = solve_displacement(model, act, dy, -dy, xc, cfg, anchored)
        return res.x, res.iters, res.resnorm

    def cold():
        xc = state.get("x", x0)
        act = active & jnp.isfinite(xc[0, 0])
        xc, it, rn = one_solve(model, act, anchored, xc * 1e-30)
        state["x"], state["it"], state["rn"] = xc, it, rn

    ms = timeit(cold, lambda: np.asarray(state["x"][0]))
    print(f"cold_solve_ms {ms:.2f}  iters {int(state['it'])} "
          f"res {float(state['rn']):.2e}", flush=True)

    # --- factorization alone, chained (made data-dependent via reg jitter)
    jit_fac = jax.jit(compute_tree_factor, static_argnums=(2,))

    def fac_only():
        xc = state.get("fx", x0)
        act = active & jnp.isfinite(xc[0, 0])
        f = jit_fac(model, act, cfg, anchored)
        state["fac"] = f
        state["fx"] = x0 + f.dinv[0, 0]

    ms_fac = timeit(fac_only, lambda: np.asarray(state["fx"][0]))
    print(f"factor_ms {ms_fac:.2f}", flush=True)

    # --- factor sub-pieces: forest factor alone vs coarse inverse alone
    import dataclasses as _dc

    from mycelium_tpu.fea.pallas_cg import (_coarse_inverse,
                                            coarse_cluster_blocks, plan_nb)
    cfg_nc = _dc.replace(cfg, tree_coarse_weight=0.0)
    jit_fac_nc = jax.jit(compute_tree_factor, static_argnums=(2,))

    def fac_forest():
        xc = state.get("nx", x0)
        act = active & jnp.isfinite(xc[0, 0])
        f = jit_fac_nc(model, act, cfg_nc, anchored)
        state["nx"] = x0 + f.dinv[0, 0]

    ms_forest = timeit(fac_forest, lambda: np.asarray(state["nx"][0]))
    print(f"forest_factor_ms {ms_forest:.2f}", flush=True)

    nb = plan_nb(model.n_nodes)
    kblk = coarse_cluster_blocks(nb, cfg)
    freem = model.free_nodes & anchored

    @jax.jit
    def coarse_only(act):
        return _coarse_inverse(model, model.chain, act, freem, cfg,
                               nb, kblk)

    def coarse_fn():
        xc = state.get("cx", x0)
        act = active & jnp.isfinite(xc[0, 0])
        ai = coarse_only(act)
        state["cx"] = x0 + ai[0, 0]
        state["ainv_dim"] = ai.shape[0]

    ms_coarse = timeit(coarse_fn, lambda: np.asarray(state["cx"][0]))
    print(f"coarse_inverse_ms {ms_coarse:.2f} (dim {state['ainv_dim']})",
          flush=True)

    fac = state["fac"]
    if fac.sinv is not None:
        dim = fac.sinv.shape[0]

        # --- dense inverse alone at the tail dim (chained, data-dependent)
        a_rand = jnp.asarray(
            np.random.default_rng(0).standard_normal((dim, dim)),
            jnp.float32) + dim * jnp.eye(dim, dtype=jnp.float32)

        @jax.jit
        def inv_chain(a):
            def body(c, _):
                m = a + c[0, 0] * 1e-30
                return jnp.linalg.inv(m), None
            out, _ = jax.lax.scan(body, a, None, length=8)
            return out

        r = inv_chain(a_rand)
        np.asarray(r[0, 0])
        t0 = time.perf_counter()
        r = inv_chain(a_rand)
        np.asarray(r[0, 0])
        print(f"dense_inv_ms {(time.perf_counter() - t0) / 8 * 1e3:.2f} "
              f"(dim {dim})", flush=True)

        # cholesky alternative at the same dim
        spd = a_rand @ a_rand.T + dim * jnp.eye(dim, dtype=jnp.float32)

        @jax.jit
        def chol_chain(a):
            def body(c, _):
                m = a + c[0, 0] * 1e-30
                return jnp.linalg.cholesky(m), None
            out, _ = jax.lax.scan(body, a, None, length=8)
            return out

        r = chol_chain(spd)
        np.asarray(r[0, 0])
        t0 = time.perf_counter()
        r = chol_chain(spd)
        np.asarray(r[0, 0])
        print(f"cholesky_ms {(time.perf_counter() - t0) / 8 * 1e3:.2f}",
              flush=True)

    # --- warm-factor solve (factor passed in), chained
    @jax.jit
    def warm_solve(model, act, anchored, xc, fac):
        res = solve_displacement(model, act, dy, -dy, xc, cfg, anchored,
                                 tree_factor_val=fac)
        return res.x, res.iters

    def warm():
        xc = state.get("wx", x0)
        act = active & jnp.isfinite(xc[0, 0])
        xc, it = warm_solve(model, act, anchored, xc * 1e-30, fac)
        state["wx"], state["wit"] = xc, it

    ms_warm = timeit(warm, lambda: np.asarray(state["wx"][0]))
    print(f"warmfactor_solve_ms {ms_warm:.2f} iters {int(state['wit'])}",
          flush=True)

    # --- PC apply alone (chained inside one jit)
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
    t0 = time.perf_counter()
    out = pc_chain(r0, fac)
    np.asarray(out[0, 0])
    print(f"pc_apply_ms {(time.perf_counter() - t0) / 16 * 1e3:.2f}",
          flush=True)


if __name__ == "__main__":
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    opt = {}
    for a in sys.argv[1:]:
        if a.startswith("--tail="):
            opt["tail"] = int(a.split("=")[1])
        elif a.startswith("--coarse="):
            opt["coarse"] = int(a.split("=")[1])
    main(int(pos[0]) if pos else 103000, **opt)
