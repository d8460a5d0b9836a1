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
