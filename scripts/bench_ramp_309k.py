"""309k-DOF production-ramp benchmark + non-solve overhead breakdown.

VERDICT r3 #3: instrument run_ramp per phase, publish the breakdown,
attack the top term, land ramp_s_309k < 5 s. The breakdown comes from
run_ramp's ``profile`` dict (per-phase wall totals: dispatch, the four
per-step sync classes, record flushes, fracture refreshes); the headline
is run_ramp_async — device-resident records, one status sync per chunk —
which removes the ~6 host round-trips per step (~30 ms relay RTT each)
that the breakdown attributes ~94% of the loop-driver ramp to.

Run (one TPU job at a time):
  python scripts/bench_ramp_309k.py [n_nodes]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main(n_target=103000):
    from bench import synthetic_mesh
    from mycelium_tpu.config import FeaConfig
    from mycelium_tpu.fea.model import build_model
    from mycelium_tpu.fea.ramp import run_ramp, run_ramp_async
    from mycelium_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    coords, conn = synthetic_mesh(n_target)
    ext = float(coords[:, 1].max() - coords[:, 1].min())
    cfg = FeaConfig(dtype="float32", rtol=1e-6, operator="chain",
                    use_pallas=True, precond="tree",
                    tree_coarse_weight=0.25, tree_reg_rel=1e-7,
                    grip_length=0.3 * ext, pallas_vmem_limit_mb=120.0)
    model = build_model(coords, conn, cfg)
    n_dof = 3 * model.n_nodes

    # loop driver with per-phase profile (warm-up first: same program)
    run_ramp(coords, conn, cfg, model=model)
    prof = {}
    t0 = time.perf_counter()
    res_loop = run_ramp(coords, conn, cfg, model=model, profile=prof)
    loop_s = time.perf_counter() - t0

    # async driver (devices-resident records)
    run_ramp_async(coords, conn, cfg, model=model)
    t0 = time.perf_counter()
    res_async = run_ramp_async(coords, conn, cfg, model=model)
    async_s = time.perf_counter() - t0

    import numpy as np
    diff = float(np.max(np.abs(res_async.disp_record
                               - res_loop.disp_record)))
    row = {
        "metric": "ramp_309k_breakdown",
        "n_dof": n_dof,
        "loop_ramp_s": round(loop_s, 2),
        "async_ramp_s": round(async_s, 2),
        "steps": int(res_loop.disp_record.shape[0]),
        "refreshes": int(prof.get("refreshes", 0)),
        "loop_profile_s": {k: round(v, 3) for k, v in prof.items()
                           if isinstance(v, float)},
        "max_record_diff": diff,
    }
    print(json.dumps(row))
    return row


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 103000)
