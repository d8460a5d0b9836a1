"""TPU sweep artifact: solver x PC timing on the archived 22,125-DOF mesh.

Produces the reference's runtime_results.csv schema
(step,solver,pc,trial,runtime_ms — src/fea_petsc_solverAndPC.cpp:221-223)
measured on the real TPU, for the artifact the VERDICT r3 #5 asks for:
a per-combo median table diffable against the reference's archived sweep
(results/sim_20251117_181147_cpp/runtime_results.csv; cg+icc 164 ms ...
gmres+gamg 794 ms medians, BASELINE.md).

Methodology: rtol 1e-5 (PETSc's default, what the reference sweep ran),
f32, cold solves; each trial times a chain of data-dependent cold solves
(fetch RTT amortized — see bench/sweep.py chain_trials); max_iter capped
at 3000 so never-converging weak-PC legs report the capped time instead
of hanging (the reference's PCs all converged; ours include 'none').

Run (one TPU job at a time):
  python scripts/bench_sweep_tpu.py [out_csv]
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

MESH_DIR = "/root/reference/results/sim_20251117_181147"
OUT = "/root/repo/docs/artifacts/runtime_results_tpu_22k.csv"


def main(out_csv=OUT):
    import numpy as np

    from mycelium_tpu.bench.sweep import run_solver_sweep
    from mycelium_tpu.config import FeaConfig
    from mycelium_tpu.io import read_mesh_dir
    from mycelium_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    coords, conn = read_mesh_dir(MESH_DIR)
    import jax
    on_tpu = jax.default_backend() != "cpu"
    cfg = FeaConfig(dtype="float32", rtol=1e-5, max_iter=3000,
                    operator="chain", use_pallas=on_tpu, precond="tree",
                    tree_coarse_weight=0.25, tree_reg_rel=1e-7)
    chain = {("cg", "tree"): 16, ("cg", "coarse"): 8,
             ("bicgstab", "tree"): 8, ("gmres", "tree"): 8}
    t0 = time.time()
    rows = run_solver_sweep(coords, conn, cfg, trials=5, out_csv=out_csv,
                            verbose=True, chain_trials=chain)
    wall = time.time() - t0

    # per-combo medians (the BASELINE.md comparison view)
    med = {}
    for step, s, pc, trial, ms in rows:
        med.setdefault((s, pc), []).append(ms)
    summary = {f"{s}+{pc}": round(float(np.median(v)), 3)
               for (s, pc), v in sorted(med.items())}
    print(json.dumps({"metric": "sweep_tpu_22k", "wall_s": round(wall, 1),
                      "n_rows": len(rows), "medians_ms": summary}))
    with open(out_csv.replace(".csv", "_medians.json"), "w") as f:
        json.dump({"provenance": f"scripts/bench_sweep_tpu.py on "
                   f"{MESH_DIR} (22,125 DOF), TPU v5e (axon tunnel), "
                   "f32, rtol 1e-5 (PETSc default, mirroring the "
                   "reference sweep), max_iter 3000, chained-trial "
                   f"timing {chain}, wall {round(wall, 1)} s",
                   "medians_ms": summary}, f, indent=1)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else OUT)
