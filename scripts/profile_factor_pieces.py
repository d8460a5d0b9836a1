"""Time the spanning-forest factorization piece by piece on the TPU:
chain_tree_diag, the level-0 Pallas kernel alone, tree_factor_fast with
kernel on/off, and the dense-tail assembly. Run:
PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_factor_pieces.py [n_nodes]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timeit(fn, sync, k=8, reps=3):
    fn()
    sync()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(k):
            fn()
        sync()
        ts.append((time.perf_counter() - t0) / k)
    return float(np.median(ts)) * 1e3


def main(n_target=103000):
    import jax
    import jax.numpy as jnp

    from mycelium_tpu.config import FeaConfig
    from mycelium_tpu.fea.model import build_model
    from mycelium_tpu.fea.ramp import anchored_mask_host
    from mycelium_tpu.fea import tree_jax as trj
    from mycelium_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from bench import synthetic_mesh

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
    state = {}

    # --- full fast factor, kernel on/off, coarse off
    import functools
    for uk in (False, True):
        jf = jax.jit(functools.partial(
            trj.tree_factor_fast, use_kernel=uk, kernel_min_slots=4096))

        def fac():
            r = reg + state.get("x", jnp.zeros((), jnp.float32)) * 1e-30
            f = jf(model.tree, model.tree_fast, model.chain, active,
                   free, free_chain, r, model.conn)
            state["x"] = f.dinv[0, 0]

        ms = timeit(fac, lambda: np.asarray(state["x"]))
        print(f"tree_factor_fast use_kernel={uk}: {ms:.2f} ms", flush=True)

    # --- kernel levels 0+1 (min_slots=512)
    jf2 = jax.jit(functools.partial(
        trj.tree_factor_fast, use_kernel=True, kernel_min_slots=512))

    def fac2():
        r = reg + state.get("x", jnp.zeros((), jnp.float32)) * 1e-30
        f = jf2(model.tree, model.tree_fast, model.chain, active,
                free, free_chain, r, model.conn)
        state["x"] = f.dinv[0, 0]

    ms = timeit(fac2, lambda: np.asarray(state["x"]))
    print(f"tree_factor_fast kernel min_slots=512: {ms:.2f} ms", flush=True)

    # --- chain_tree_diag alone
    jd = jax.jit(trj.chain_tree_diag)

    def diag():
        r = reg + state.get("d", jnp.zeros((), jnp.float32)) * 1e-30
        D = jd(model.tree, model.tree_fast, model.chain, active,
               free_chain, r)
        state["d"] = D[0, 0]

    ms = timeit(diag, lambda: np.asarray(state["d"]))
    print(f"chain_tree_diag: {ms:.2f} ms", flush=True)

    # --- level-0 kernel alone (same shapes as the real level 0)
    from mycelium_tpu.fea.pallas_factor import pcr_level_kernel
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

    def ker():
        j = state.get("k", jnp.zeros((), jnp.float32)) * 1e-30
        dv, xc, _pk = jk(tuple(p + j for p in D0), B0, fg0, lg0)
        state["k"] = dv[0][0]

    ms = timeit(ker, lambda: np.asarray(state["k"]))
    print(f"pcr_level_kernel S={S0} steps={steps0}: {ms:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 103000)
