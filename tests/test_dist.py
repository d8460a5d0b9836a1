"""Multi-process (multi-host skeleton) tests: jax.distributed wiring and
the coordinator-only IO guard — the reference's mpirun -np N process model
(src/fea_petsc_parallel.cpp:156-171) WITHOUT its every-rank-writes bug
(fea_petsc_parallel.cpp:487-570, SURVEY.md §2.5.14).

These launch real subprocesses (each its own JAX runtime) so they avoid
the session's initialized backend; the in-process tests below cover the
single-process degenerate behavior.
"""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r'''
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from mycelium_tpu.utils.dist import (initialize_distributed, is_coordinator,
                                     coordinator_barrier, process_count)
initialize_distributed()
assert process_count() == 2
rank = jax.process_index()

# every rank computes; only the coordinator writes (checkpoint.save_*
# carries the guard internally)
from mycelium_tpu.config import GrowthConfig
from mycelium_tpu.growth import init_state
from mycelium_tpu.growth.step import growth_step
from mycelium_tpu.io.checkpoint import save_growth_state
cfg = GrowthConfig(max_segments=64, max_hyphae=32, h0_per_point=1,
                   inoculum_nx=1, inoculum_ny=1)
st, ea = init_state(cfg)
st = growth_step(st, ea, cfg)
save_growth_state(os.path.join({outdir!r}, f"ckpt_rank{{rank}}.npz"), st)
coordinator_barrier("done")
print(f"rank {{rank}} ok coordinator={{is_coordinator()}}", flush=True)
'''


_SOLVE_WORKER = r'''
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_enable_x64", True)
sys.path.insert(0, {repo!r})
from mycelium_tpu.utils.dist import initialize_distributed, is_coordinator
initialize_distributed()
assert jax.process_count() == 2 and len(jax.devices()) == 4
rank = jax.process_index()

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh
from mycelium_tpu import scenes
from mycelium_tpu.config import archive_parity_config
from mycelium_tpu.fea import build_model
from mycelium_tpu.fea.ramp import run_ramp, run_ramp_sharded
from mycelium_tpu.fea.shard import sharded_cg_solver
from mycelium_tpu.fea.solve import solve_displacement

sc = scenes.test_X()
cfg = archive_parity_config(operator="chain", precond="tree",
                            tree_coarse_weight=0.25, tree_reg_rel=1e-7,
                            n_steps=6, displacement_max=0.06)
model = build_model(sc.coords, sc.conn, cfg)

# --- cross-process distributed KSP solve (fea_petsc_parallel contract):
# both processes enter sharded_cg_solver over the UNION device set; the
# CG dot-products psum across processes (gloo), like KSPSolve's
# MPI_Allreduce across ranks (reference :336-351)
mesh = Mesh(np.asarray(jax.devices()), ("shard",))
solve = sharded_cg_solver(model, cfg, mesh)
active = np.ones((model.n_elems,), bool)
x0 = np.zeros((model.n_nodes, 3))
res = solve(active, 0.01, -0.01, x0)
assert bool(res.converged)
ref = solve_displacement(model, jnp.asarray(active), 0.01, -0.01,
                         jnp.asarray(x0), cfg)   # process-local reference
from jax.experimental import multihost_utils
xg = multihost_utils.process_allgather(res.x, tiled=True)
err = float(np.linalg.norm(np.asarray(xg) - np.asarray(ref.x)))
assert err < 1e-6, f"rank {{rank}}: cross-process solve L2 {{err:.3e}}"

# --- full sharded ramp across processes == local single-device ramp
res1 = run_ramp(sc.coords, sc.conn, cfg, model=model)
resN = run_ramp_sharded(sc.coords, sc.conn, cfg, mesh, model=model)
assert res1.disp_record.shape == resN.disp_record.shape
np.testing.assert_allclose(resN.disp_record, res1.disp_record,
                           rtol=1e-7, atol=1e-12)
np.testing.assert_array_equal(resN.active_record, res1.active_record)
np.testing.assert_allclose(resN.force_disp, res1.force_disp,
                           rtol=1e-7, atol=1e-16)

# --- coordinator-only CSV writes (the reference's every-rank-writes bug
# fixed: fea_petsc_parallel.cpp:487-570 vs utils/dist.is_coordinator)
if is_coordinator():
    from mycelium_tpu.io import write_fea_records
    write_fea_records(os.path.join({outdir!r}, f"fea_rank{{rank}}"),
                      resN.stress_record, resN.active_record,
                      resN.disp_record, resN.force_disp)
from mycelium_tpu.utils.dist import coordinator_barrier
coordinator_barrier("records")
print(f"rank {{rank}} sharded-solve ok L2={{err:.2e}}", flush=True)
'''


def test_two_process_sharded_solve_and_ramp(tmp_path):
    """The distributed-compute contract of the reference's MPI binary
    (src/fea_petsc_parallel.cpp:156-485): TWO OS processes form a
    jax.distributed cluster, both enter the sharded CG over the global
    4-device mesh (dot products = cross-process psum), and the full
    sharded ramp's records match a single-process run. Only the
    coordinator writes result CSVs."""
    outdir = str(tmp_path)
    script = _SOLVE_WORKER.format(repo=REPO, outdir=outdir)
    env0 = dict(os.environ,
                JAX_COORDINATOR_ADDRESS="127.0.0.1:12361",
                JAX_NUM_PROCESSES="2")
    procs = []
    for pid in (0, 1):
        env = dict(env0, JAX_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, "-c", script], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode())
        assert p.returncode == 0, out.decode()[-3000:]
    assert "rank 0 sharded-solve ok" in outs[0]
    assert "rank 1 sharded-solve ok" in outs[1]
    # exactly one writer
    assert os.path.exists(os.path.join(outdir, "fea_rank0",
                                       "node_displacements.csv"))
    assert not os.path.exists(os.path.join(outdir, "fea_rank1"))


def test_two_process_cluster_coordinator_only_io(tmp_path):
    outdir = str(tmp_path)
    script = _WORKER.format(repo=REPO, outdir=outdir)
    env0 = dict(os.environ,
                JAX_COORDINATOR_ADDRESS="127.0.0.1:12359",
                JAX_NUM_PROCESSES="2")
    procs = []
    for pid in (0, 1):
        env = dict(env0, JAX_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, "-c", script], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=180)
        outs.append(out.decode())
        assert p.returncode == 0, out.decode()[-2000:]
    assert "rank 0 ok coordinator=True" in outs[0]
    assert "rank 1 ok coordinator=False" in outs[1]
    # exactly one writer: rank 0's file exists, rank 1's does not
    assert os.path.exists(os.path.join(outdir, "ckpt_rank0.npz"))
    assert not os.path.exists(os.path.join(outdir, "ckpt_rank1.npz"))


def test_single_process_guards_are_transparent():
    from mycelium_tpu.utils.dist import (coordinator_barrier, is_coordinator,
                                         process_count, process_index)
    assert process_index() == 0
    assert process_count() == 1
    assert is_coordinator()
    coordinator_barrier()   # no-op
