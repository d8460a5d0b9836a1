"""DOF-scaling benchmark: PCG solves/sec at growing system sizes.

BASELINE.json's north star asks for growth steps/sec and PCG solves/sec at
1e5 DOF. Run:  python -m mycelium_tpu.bench.scaling [n_nodes ...]

Meshes are mycelium-like jittered grids with diagonal braces (bounded node
degree, mostly-chain structure) so the chain-ordered operator applies.
Each measurement chains cold solves inside one dispatch (see bench.py for
the methodology rationale on tunnel-attached TPUs).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def run(n_nodes_list, n_chain=8, rtol=1e-6, quiet=False):
    import jax
    import jax.numpy as jnp

    from ..utils import enable_compilation_cache
    enable_compilation_cache()

    from ..config import FeaConfig
    from ..fea.model import build_model
    from ..fea.ramp import anchored_mask_host
    from ..fea.solve import solve_displacement

    sys.path.insert(0, ".")
    from bench import synthetic_mesh

    results = []
    for n_target in n_nodes_list:
        coords, conn = synthetic_mesh(n_target)
        n_dof = 3 * coords.shape[0]
        # grip 30% of the extent per side, the reference workload's
        # fraction (GRIP_LENGTH=1.5 on the 5 mm dish): a sliver-gripped
        # random tree is floppy enough that soft bending modes
        # (~k_bd/(path len)^4) sink below any PC floor and f32 CG stalls
        # on conditioning, which benchmarks precision, not speed
        ext = float(coords[:, 1].max() - coords[:, 1].min())
        # build_model gates the Pallas tables on cfg.pallas_vmem_limit_mb
        # and falls back to the XLA path of the same numerics when the
        # tables outgrow VMEM (pallas_tree.py estimator)
        cfg = FeaConfig(dtype="float32", rtol=rtol, warm_start=False,
                        operator="chain",
                        use_pallas=jax.default_backend() != "cpu",
                        precond="tree", tree_coarse_weight=0.25,
                        tree_reg_rel=1e-7, grip_length=0.3 * ext,
                        pallas_vmem_limit_mb=120.0)
        t0 = time.time()
        model = build_model(coords, conn, cfg)
        build_s = time.time() - t0
        use_pallas = (model.tree_packed is not None
                      or getattr(model, "tree_packed_big", None) is not None)
        pallas_mode = ("single" if model.tree_packed is not None else
                       "hybrid" if use_pallas else "xla")
        grip = np.asarray(model.top_nodes) | np.asarray(model.bot_nodes)
        anchored = jnp.asarray(anchored_mask_host(
            np.asarray(model.conn), np.ones(model.n_elems, bool), grip))
        active = jnp.ones((model.n_elems,), bool)
        x0 = jnp.zeros((model.n_nodes, 3), jnp.float32)
        dy = jnp.asarray(0.02, jnp.float32)

        use_big = model.tree_packed is None
        if use_big:
            # No single whole-solve kernel: chain cold solves on the host
            # as the production two-program composition (ramp.run_ramp):
            # a jitted tree factorization + a jitted CG step — covers the
            # hybrid (Pallas matvec) AND the pure-XLA large-mesh modes.
            # Folding 8 cold solves (each with its factorization) into one
            # scan program stalls the TPU compiler past ~300k nodes.
            # Dispatches are async and dependent (each factorization reads
            # the previous solution), so the chain still times true
            # back-to-back cold solves.
            @jax.jit
            def one_solve(model, active, anchored, xc):
                # factorization INSIDE the program (tree_factor_val=None
                # -> computed in-trace): one dispatch per true cold solve
                # instead of two (~10 ms host overhead each through the
                # relay). The data-dependent perturbation that stops XLA
                # from caching the factorization also lives IN the jit:
                # eager host ops through the axon tunnel cost ~1 ms each
                # and were inflating this measurement ~15% (traced).
                act = active & jnp.isfinite(xc[0, 0])
                res = solve_displacement(model, act, dy, -dy, xc * 1e-30,
                                         cfg, anchored)
                return res.x, res.iters

            def chained_host(k):
                xc, it = x0, None
                for _ in range(k):
                    xc, it = one_solve(model, active, anchored, xc)
                jax.block_until_ready(xc)
                return xc, it

            _, iters = chained_host(2)          # compile both programs
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                _, iters = chained_host(n_chain)
                ts.append((time.perf_counter() - t0) / n_chain)
            iters = jnp.broadcast_to(iters, (n_chain,))

            # factorization share of the cold solve (VERDICT r2 #2 asks
            # for the per-size factor/CG split): chain jitted
            # compute_tree_factor calls, each data-dependent on the last
            from ..fea.solve import compute_tree_factor

            @jax.jit
            def one_fac(model, active, anchored, xc):
                act = active & jnp.isfinite(xc[0, 0])
                f = compute_tree_factor(model, act, cfg, anchored)
                return xc * 1e-30 + f.dinv[0, 0]

            def fac_chain(k):
                xc = x0
                for _ in range(k):
                    xc = one_fac(model, active, anchored, xc)
                jax.block_until_ready(xc)

            fac_chain(2)
            fts = []
            for _ in range(3):
                t0 = time.perf_counter()
                fac_chain(n_chain)
                fts.append((time.perf_counter() - t0) / n_chain)
            factor_ms = round(float(np.median(fts)) * 1e3, 2)
        else:
            @jax.jit
            def chained(model, active, anchored, x0):
                def body(carry, _):
                    # make the active mask depend on the carry so XLA
                    # cannot hoist the per-solve factorization out of the
                    # scan: every chained solve is a TRUE cold solve
                    # (setup included)
                    act = active & jnp.isfinite(carry[0, 0])
                    res = solve_displacement(model, act, dy, -dy,
                                             carry * 1e-30, cfg, anchored)
                    return res.x, res.iters
                return jax.lax.scan(body, x0, None, length=n_chain)

            xl, iters = chained(model, active, anchored, x0)
            jax.block_until_ready(xl)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                xl, iters = chained(model, active, anchored, x0)
                jax.block_until_ready(xl)
                ts.append((time.perf_counter() - t0) / n_chain)
            factor_ms = None    # in-kernel factorization, not separable
        per_solve = float(np.median(ts))
        row = {
            "n_dof": n_dof,
            "solve_ms": round(per_solve * 1e3, 2),
            "solves_per_sec": round(1.0 / per_solve, 2),
            "cg_iters": int(np.asarray(iters)[-1]),
            "pallas": use_pallas,
            "pallas_mode": pallas_mode,
            "plan_build_s": round(build_s, 2),
        }
        if factor_ms is not None:
            row["factor_ms"] = factor_ms
        from .roofline import roofline_row
        row.update(roofline_row(model, row["cg_iters"], per_solve))
        results.append(row)
        if not quiet:
            print(json.dumps(row), flush=True)
    return results


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [7375, 33000]
    run(sizes)
