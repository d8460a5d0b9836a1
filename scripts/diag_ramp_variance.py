"""Diagnose the 309k async-ramp variance (VERDICT r4 weak #2).

BENCH_r04 recorded ramp_s_309k = 7.23 s while scripts/bench_ramp_309k.py
recorded 4.04 s for the IDENTICAL measurement. Two candidate causes:

1. in-process state: bench.py runs the 22k chained solve and the 103k
   scaling leg before the ramp leg (allocator/program state);
2. single-sample noise: bench.py times the ramp ONCE, and the ~70 MB
   end-of-ramp record fetch rides the axon relay whose throughput
   varies — no median smooths it.

This script measures, in ONE process: (a) 3 timed async ramps fresh
(only the ramp programs compiled/run before them), then (b) the 22k
chained-solve leg and the 103k scaling leg exactly as bench.py runs
them, then (c) 3 timed async ramps again. Each ramp reports its
device-chunk wall total (sum of solve_seconds — everything before the
final record fetch) and the record-fetch remainder, so throughput noise
is attributed.

Run (one TPU job at a time):
  python scripts/diag_ramp_variance.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import numpy as np

    from bench import synthetic_mesh
    from mycelium_tpu.config import FeaConfig
    from mycelium_tpu.fea.model import build_model
    from mycelium_tpu.fea.ramp import run_ramp_async
    from mycelium_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    coords, conn = synthetic_mesh(103000)
    ext = float(coords[:, 1].max() - coords[:, 1].min())
    cfg = FeaConfig(dtype="float32", rtol=1e-6, operator="chain",
                    use_pallas=True, precond="tree",
                    tree_coarse_weight=0.25, tree_reg_rel=1e-7,
                    grip_length=0.3 * ext, pallas_vmem_limit_mb=120.0)
    model = build_model(coords, conn, cfg)

    def timed_ramps(tag, k=3):
        rows = []
        for _ in range(k):
            t0 = time.perf_counter()
            res = run_ramp_async(coords, conn, cfg, model=model)
            total = time.perf_counter() - t0
            chunk = float(np.sum(res.solve_seconds))
            rows.append({"total_s": round(total, 2),
                         "device_chunks_s": round(chunk, 2),
                         "record_fetch_s": round(total - chunk, 2)})
        print(json.dumps({"phase": tag, "ramps": rows}), flush=True)
        return rows

    run_ramp_async(coords, conn, cfg, model=model)   # compile warm-up
    fresh = timed_ramps("fresh")

    # bench.py's preceding in-process legs, verbatim order
    import os
    os.environ["MYC_BENCH_SMALL"] = "1"   # headline-only bench.main()
    from bench import main as bench_main
    bench_main()
    os.environ.pop("MYC_BENCH_SMALL")
    from mycelium_tpu.bench.scaling import run as scaling_run
    scaling_run([103000], n_chain=8, quiet=True)

    after = timed_ramps("after_bench_legs")

    med = lambda rows, k: float(np.median([r[k] for r in rows]))  # noqa
    print(json.dumps({
        "metric": "ramp_variance_diag",
        "fresh_median_s": round(med(fresh, "total_s"), 2),
        "after_median_s": round(med(after, "total_s"), 2),
        "fresh_fetch_median_s": round(med(fresh, "record_fetch_s"), 2),
        "after_fetch_median_s": round(med(after, "record_fetch_s"), 2),
    }))


if __name__ == "__main__":
    main()
