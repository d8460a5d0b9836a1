"""Round-5 scaling artifact: the same meshes, chain length, and columns
as scaling_r04.json so round-over-round solver trends are attributable
to code (VERDICT r4 #8 — the round-4 mesh-generator change made the
17.7-vs-23.6 ms comparison ambiguous; the generator is now frozen).

Run (one TPU job at a time):
  python scripts/bench_scaling_r05.py [sizes...]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/docs/artifacts/scaling_r05.json"
SIZES = [7375, 33000, 103000, 340000, 1000000]


def main(sizes=None):
    from mycelium_tpu.bench.scaling import run
    sizes = sizes or SIZES
    t0 = time.time()
    rows = run(sizes, n_chain=8)
    doc = {
        "metric": "pcg_cold_solve_scaling_round5",
        "provenance": "scripts/bench_scaling_r05.py (bench.scaling run "
                      f"{sizes}, n_chain=8 — the SAME chain length as "
                      "bench.py's 309k leg and the r04 1M/3M rows) on "
                      "the TPU v5e (axon tunnel), round 5; f32, rtol "
                      "1e-6, true cold solves (tree factorization inside "
                      "the program) chained back-to-back. Meshes: "
                      "bench.synthetic_mesh (uniform ~0.05 element "
                      "length, bounce walls, 30%-extent grips) — "
                      "UNCHANGED from round 4, so row deltas vs "
                      "scaling_r04.json are code-attributable. Baseline: "
                      "PETSc cg+icc 164 ms @ 22,125 DOF scaled linearly "
                      "in DOF.",
        "wall_s": round(time.time() - t0, 1),
        "rows": [
            {**{"n_nodes": n}, **{k: r[k] for k in (
                "n_dof", "solve_ms", "solves_per_sec", "cg_iters",
                "pallas_mode", "plan_build_s", "bytes_per_iter",
                "bytes_total", "achieved_gbps", "roofline_frac")
                if k in r},
             **({"factor_ms": r["factor_ms"]} if "factor_ms" in r else {}),
             "vs_baseline": round(164.0 * r["n_dof"] / 22125.0
                                  / r["solve_ms"], 1)}
            for n, r in zip(sizes, rows)
        ],
    }
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"metric": "scaling_r05_done",
                      "rows": len(rows), "out": OUT}))


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or None)
