"""Phase timing of the 1M-DOF (340k-node) XLA-path cold solve.

The round-5 trace puts the 340k-node cold solve at 55 ms device: CG
17.7 ms (4 iters) + ~37 ms outside CG. The op probe (/tmp/op_probe3)
says gathers/scatters are the expensive op class at this scale
(plane gather 2.4 ms, (N,3) perm gather 1.9 ms, jump gather+scatter
1.8 ms at the real J=14k). This script times each phase by chaining it
inside one jitted scan (RTT amortized over 64 reps) to decide what the
streamed-solve work should attack first.

Run (one TPU job at a time):  python scripts/profile_solve_1m.py [n]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main(n_target=340000):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import synthetic_mesh
    from mycelium_tpu.config import FeaConfig
    from mycelium_tpu.fea.model import build_model
    from mycelium_tpu.fea.ramp import anchored_mask_host
    from mycelium_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    coords, conn = synthetic_mesh(n_target)
    ext = float(coords[:, 1].max() - coords[:, 1].min())
    cfg = FeaConfig(dtype="float32", rtol=1e-6, warm_start=False,
                    operator="chain", use_pallas=True, precond="tree",
                    tree_coarse_weight=0.25, tree_reg_rel=1e-7,
                    grip_length=0.3 * ext, pallas_vmem_limit_mb=120.0)
    model = build_model(coords, conn, cfg)
    grip = np.asarray(model.top_nodes) | np.asarray(model.bot_nodes)
    anchored = jnp.asarray(anchored_mask_host(
        np.asarray(model.conn), np.ones(model.n_elems, bool), grip))
    active = jnp.ones((model.n_elems,), bool)
    free = jnp.logical_and(model.free_nodes, anchored)
    plan = model.chain
    n = model.n_nodes
    dtype = jnp.float32

    L = 64

    def timed(name, body, x0, *args):
        def fn(x, *a):
            def step(c, _):
                return body(c, *a), None
            out, _ = jax.lax.scan(step, x, None, length=L)
            return jax.tree_util.tree_reduce(
                lambda s, l: s + jnp.sum(l[..., :1] if l.ndim else l),
                out, jnp.zeros((), dtype))
        f = jax.jit(fn)
        float(f(x0, *args))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(x0, *args))
            ts.append((time.perf_counter() - t0) / L * 1e3)
        print(json.dumps({"phase": name,
                          "ms": round(float(np.median(ts)), 3)}),
              flush=True)

    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    up = [jnp.asarray(rng.standard_normal(n).astype(np.float32))
          for _ in range(3)]

    from mycelium_tpu.fea.chain import chain_apply, plan_active_masks, \
        plan_active_masks_bool

    chain_act, jump_act = plan_active_masks(plan, active)
    chain_act_b, jump_act_b = plan_active_masks_bool(plan, active)
    free_chain = free[plan.perm]

    # --- per-iteration pieces ---
    timed("matvec_full", lambda x: chain_apply(plan, chain_act, jump_act,
                                               x * 1.0000001), u)

    def chain_only(x):
        import dataclasses
        p2 = plan._replace(ja=jnp.full_like(plan.ja, n),
                           jb=jnp.full_like(plan.jb, n))
        return chain_apply(p2, chain_act, jump_act * 0.0, x * 1.0000001)
    timed("matvec_chain_only", chain_only, u)

    from mycelium_tpu.fea.solve import _coarse_chain_fn, \
        compute_tree_factor
    fac = jax.jit(compute_tree_factor, static_argnums=(2,))(
        model, active, cfg, anchored)

    from mycelium_tpu.fea.tree_jax import tree_apply_chain_planes
    timed("pc_tree_apply", lambda t: tuple(
        o * 1.0000001 for o in tree_apply_chain_planes(
            model.tree, fac, t)), tuple(
        p[:model.tree.n_slots] * 1.0 for p in up))

    cc = _coarse_chain_fn(model, active, cfg, free, ainv=fac.coarse_ainv)
    timed("pc_coarse_apply", lambda x: cc(x) + x * 1e-9, u)

    # --- per-solve pieces ---
    timed("perm_gather", lambda x: x[plan.perm] * 1.0000001, u)
    timed("inv_perm_gather", lambda x: x[plan.inv_perm] * 1.0000001, u)
    timed("bool_gathers_plan", lambda x: (
        x + plan_active_masks_bool(
            plan, active & (x[0, 0] < 1e30))[0][:1].astype(dtype)), u)

    def factor_body(x):
        f = compute_tree_factor(model, active & (x[0, 0] < 1e30), cfg,
                                anchored)
        return x * 1e-30 + f.dinv[0, 0]
    timed("tree_factor_full", factor_body, u)

    from mycelium_tpu.fea.pallas_cg import _coarse_inverse, \
        coarse_cluster_blocks, plan_nb
    nb = plan_nb(n)
    kblk = coarse_cluster_blocks(nb, cfg)

    def coarse_inv_body(x):
        ai = _coarse_inverse(model, plan, active & (x[0, 0] < 1e30),
                             free, cfg, nb, kblk)
        return x * 1e-30 + ai[0, 0]
    timed("coarse_inverse", coarse_inv_body, u)

    from mycelium_tpu.fea.tree_jax import chain_tree_diag

    def diag_body(x):
        d = chain_tree_diag(model.tree, model.tree_fast, plan,
                            active & (x[0, 0] < 1e30), free_chain,
                            jnp.asarray(cfg.reg, dtype), chain_act_b,
                            jump_act_b)
        return x * 1e-30 + d[0, 0]
    timed("tree_diag", diag_body, u)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 340000)
