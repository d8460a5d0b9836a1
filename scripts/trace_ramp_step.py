"""Device-op attribution for the async-ramp step at 103k nodes, plus the
340k-node (1M-DOF) cold-solve trace — the round-5 measurement base for
the streamed-solve work (VERDICT r4 #2) and the ramp device time.

Run (one TPU job at a time):
  python scripts/trace_ramp_step.py
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")


def ramp_trace(n_target=103000):
    import jax
    import numpy as np

    from bench import synthetic_mesh
    from mycelium_tpu.config import FeaConfig
    from mycelium_tpu.fea.model import build_model
    from mycelium_tpu.fea.ramp import run_ramp_async
    from mycelium_tpu.utils import enable_compilation_cache
    from trace_solve import device_summary
    enable_compilation_cache()

    coords, conn = synthetic_mesh(n_target)
    ext = float(coords[:, 1].max() - coords[:, 1].min())
    cfg = FeaConfig(dtype="float32", rtol=1e-6, operator="chain",
                    use_pallas=True, precond="tree",
                    tree_coarse_weight=0.25, tree_reg_rel=1e-7,
                    grip_length=0.3 * ext, pallas_vmem_limit_mb=120.0)
    model = build_model(coords, conn, cfg)
    run_ramp_async(coords, conn, cfg, model=model)      # warm-up
    with jax.profiler.trace("/tmp/trace_ramp"):
        res = run_ramp_async(coords, conn, cfg, model=model)
    n = int(res.force_disp.shape[0])
    print(f"ramp steps {n}, device-chunk wall "
          f"{float(np.sum(res.solve_seconds)):.2f} s", flush=True)
    device_summary("/tmp/trace_ramp", f"async ramp step @{n_target}", n,
                   top=25)


def main():
    ramp_trace()
    from trace_solve import main as solve_trace
    solve_trace(340000)


if __name__ == "__main__":
    main()
