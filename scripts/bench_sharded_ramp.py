"""Sharded-ramp wall time vs the single-chip driver at >= 99k DOF.

run_ramp_sharded is the end-to-end equivalent of the reference's MPI
binary (mpirun -np N fea_petsc_parallel, SURVEY.md 3.4). This measures
its production overhead against run_ramp at the same mesh on the
virtual 8-device CPU mesh: with one physical chip the sharded driver
cannot WIN (collectives + redundant PC on emulated devices), so the
check is that the overhead stays bounded (target: within ~2x).

Run (CPU, forced by the conftest-style env):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  PYTHONPATH=/root/repo python scripts/bench_sharded_ramp.py [n_nodes]
"""

import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
sys.path.insert(0, "/root/repo")


def main(n_target=33000):
    import jax
    import numpy as np

    from bench import synthetic_mesh
    from mycelium_tpu.config import FeaConfig
    from mycelium_tpu.fea.model import build_model
    from mycelium_tpu.fea.ramp import run_ramp, run_ramp_sharded
    from mycelium_tpu.fea.shard import default_mesh
    from mycelium_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    coords, conn = synthetic_mesh(n_target)
    ext = float(coords[:, 1].max() - coords[:, 1].min())
    cfg = FeaConfig(dtype="float32", rtol=1e-6, operator="chain",
                    use_pallas=False, precond="tree",
                    tree_coarse_weight=0.25, tree_reg_rel=1e-7,
                    grip_length=0.3 * ext)
    model = build_model(coords, conn, cfg)
    n_dof = 3 * model.n_nodes

    def timed(fn):
        fn()                      # compile warm-up (same program)
        t0 = time.perf_counter()
        res = fn()
        return time.perf_counter() - t0, res

    single_s, res1 = timed(lambda: run_ramp(coords, conn, cfg,
                                            model=model))
    mesh = default_mesh(len(jax.devices()))
    shard_s, resN = timed(lambda: run_ramp_sharded(coords, conn, cfg,
                                                   mesh, model=model))
    err = float(np.max(np.abs(np.asarray(resN.disp_record)
                              - np.asarray(res1.disp_record))))
    row = {
        "metric": "sharded_ramp_overhead",
        "n_dof": n_dof,
        "n_devices": len(jax.devices()),
        "single_chip_s": round(single_s, 2),
        "sharded_s": round(shard_s, 2),
        "overhead_x": round(shard_s / single_s, 2),
        "max_record_diff": err,
    }
    print(json.dumps(row))
    return row


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 33000)
