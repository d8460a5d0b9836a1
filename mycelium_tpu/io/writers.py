"""Output writers reproducing the reference's CSV contracts (SURVEY.md §2.3).

Growth outputs (reference src/mycelium_sim_2D.py:686,723-727, and the C++
snapshot contract mycelium_sim_2D.cpp:463-475):
  results/sim_<ts>/mycelium_growth_stats.csv
  results/sim_<ts>/nodes.csv + elements.csv
  results/sim_<ts>/snapshots/step_%04d.csv

FEA outputs (reference src/fea_solver.py:297-316, fea_petsc.cpp:433-516):
  <dir>/fea_results/{stress_record.csv, active_elements.csv,
                     node_displacements.csv, force_displacement.csv,
                     runtime.txt, solve_runtime.txt}
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence

import numpy as np

GROWTH_STATS_COLUMNS = ["hyphae", "segments", "active_tips", "passive_tips",
                        "anastomosed", "branches", "total_length_mm", "step"]


def _write_csv(path: str, header: Sequence[str], rows: np.ndarray,
               fmt=repr) -> None:
    with open(path, "w") as f:
        f.write(",".join(map(str, header)) + "\n")
        for row in rows:
            f.write(",".join(fmt(v) for v in row) + "\n")


def write_growth_stats(out_dir: str, history: List[Dict],
                       variant: str = "python") -> str:
    """mycelium_growth_stats.csv.

    variant='python': column order hyphae,...,total_length_mm,step
    (mycelium_sim_2D.py:233-241,686); variant='cpp': step FIRST and 6-
    significant-digit lengths, matching the C++ growth sim's contract
    (mycelium_sim_2D.cpp:559,571 — both variants exist in the reference
    archive, e.g. sim_20251122_155110 vs sim_20251117_181147)."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "mycelium_growth_stats.csv")
    if variant == "cpp":
        cols = ["step"] + [c for c in GROWTH_STATS_COLUMNS if c != "step"]
        fmt_len = lambda v: f"{float(v):.6g}"  # noqa: E731 — ostream default
    else:
        cols = GROWTH_STATS_COLUMNS
        fmt_len = lambda v: repr(float(v))  # noqa: E731
    with open(path, "w") as f:
        f.write(",".join(cols) + "\n")
        for st in history:
            f.write(",".join(str(int(st[c])) if c != "total_length_mm"
                             else fmt_len(st[c]) for c in cols) + "\n")
    return path


def dedup_nodes(starts: np.ndarray, ends: np.ndarray, decimals: int = 6):
    """Segment endpoints -> (nodes (n,3), conn (e,2)) with first-appearance
    node ids, deduplicating coordinates rounded to 6 decimals
    (reference export_geometry, mycelium_sim_2D.py:693-728).
    """
    from ..native import meshio_native
    pts = np.empty((2 * len(starts), 3), dtype=np.float64)
    pts[0::2] = starts   # interleave so first-appearance order matches the
    pts[1::2] = ends     # reference's per-segment (start, end) visit order
    if meshio_native.available():
        out = meshio_native.dedup_nodes(pts, decimals)
        if out is not None:
            nodes, inv = out
            conn = inv.reshape(-1, 2).astype(np.int64)
            return nodes, conn
    key = np.round(pts, decimals)
    # np.unique sorts; remap to first-appearance order like the dict-based
    # reference implementation
    _, first_idx, inverse = np.unique(key, axis=0, return_index=True,
                                      return_inverse=True)
    order = np.argsort(first_idx, kind="stable")
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    ids = rank[inverse]
    nodes = pts[np.sort(first_idx)]
    conn = ids.reshape(-1, 2)
    return nodes, conn


def export_geometry(out_dir: str, starts: np.ndarray, ends: np.ndarray) -> str:
    """Write nodes.csv / elements.csv (contract: mycelium_sim_2D.py:723-727)."""
    os.makedirs(out_dir, exist_ok=True)
    nodes, conn = dedup_nodes(starts, ends)
    with open(os.path.join(out_dir, "nodes.csv"), "w") as f:
        f.write("node_id,x,y,z\n")
        for i, (x, y, z) in enumerate(nodes):
            f.write(f"{i},{float(x)!r},{float(y)!r},{float(z)!r}\n")
    with open(os.path.join(out_dir, "elements.csv"), "w") as f:
        f.write("elem_id,n1,n2\n")
        for i, (a, b) in enumerate(conn):
            f.write(f"{i},{a},{b}\n")
    return out_dir


def write_snapshot_csv(snapshot_dir: str, step: int, starts: np.ndarray,
                       ends: np.ndarray, intensity: np.ndarray) -> str:
    """Per-step snapshot CSV matching the C++ growth sim's contract
    (mycelium_sim_2D.cpp:463-475): columns x1,y1,x2,y2,intensity where
    intensity = I*L un-normalized."""
    os.makedirs(snapshot_dir, exist_ok=True)
    path = os.path.join(snapshot_dir, f"step_{step:04d}.csv")
    with open(path, "w") as f:
        f.write("x1,y1,x2,y2,intensity\n")
        for (x1, y1), (x2, y2), c in zip(starts[:, :2], ends[:, :2],
                                         intensity):
            f.write(f"{float(x1)!r},{float(y1)!r},{float(x2)!r},"
                    f"{float(y2)!r},{float(c)!r}\n")
    return path


def write_fea_records(fea_dir: str, stress_record: np.ndarray,
                      active_record: np.ndarray, disp_record: np.ndarray,
                      force_disp: np.ndarray,
                      variant: str = "python") -> None:
    """The four FEA record CSVs.

    stress_record: (n_rec, n_elems); active_record: (n_rec, n_elems) bool;
    disp_record: (n_rec, n_dof); force_disp: (n_rec, 2).

    variant='python' (fea_solver.py:297-316): True/False actives, numeric
    0..n_dof-1 displacement columns, repr floats.
    variant='cpp' (fea_petsc.cpp:433-516): 1/0 actives
    (fea_petsc.cpp:457-474), node_i_x.. grouped-by-component displacement
    HEADERS over data that stays in DOF order — the reference C++ header is
    mislabeled relative to its data (fea_petsc.cpp:477-505 and SURVEY.md
    §2.3) and we reproduce that faithfully — and 12-significant-digit
    values (setprecision(12), fea_petsc.cpp:449,500,513).
    """
    os.makedirs(fea_dir, exist_ok=True)
    n_rec, n_elems = stress_record.shape
    steps = np.arange(1, n_rec + 1)
    cpp = variant == "cpp"
    fv = (lambda v: f"{float(v):.12g}") if cpp else (lambda v: repr(float(v)))

    elem_cols = [f"elem_{i}" for i in range(n_elems)]
    with open(os.path.join(fea_dir, "stress_record.csv"), "w") as f:
        f.write(",".join(elem_cols + ["step"]) + "\n")
        for r, s in zip(stress_record, steps):
            f.write(",".join(fv(v) for v in r) + f",{s}\n")

    with open(os.path.join(fea_dir, "active_elements.csv"), "w") as f:
        f.write(",".join(elem_cols + ["step"]) + "\n")
        for r, s in zip(active_record, steps):
            if cpp:
                f.write(",".join("1" if v else "0" for v in r) + f",{s}\n")
            else:
                f.write(",".join("True" if v else "False" for v in r)
                        + f",{s}\n")

    n_dof = disp_record.shape[1]
    if cpp:
        n_nodes = n_dof // 3
        disp_cols = [f"node_{i}_{ax}" for ax in ("x", "y", "z")
                     for i in range(n_nodes)]
    else:
        disp_cols = [str(i) for i in range(n_dof)]
    with open(os.path.join(fea_dir, "node_displacements.csv"), "w") as f:
        f.write(",".join(disp_cols) + ",step\n")
        for r, s in zip(disp_record, steps):
            f.write(",".join(fv(v) for v in r) + f",{s}\n")

    with open(os.path.join(fea_dir, "force_displacement.csv"), "w") as f:
        f.write("total_displacement,total_force\n")
        for d, force in force_disp:
            f.write(f"{fv(d)},{fv(force)}\n")


def write_runtime(fea_dir: str, seconds: float) -> None:
    """runtime.txt (fea_solver.py:331-333)."""
    os.makedirs(fea_dir, exist_ok=True)
    with open(os.path.join(fea_dir, "runtime.txt"), "w") as f:
        f.write(f"Total FEA runtime: {seconds:.6f} seconds\n")


def write_solve_runtimes(fea_dir: str, per_step_seconds: Sequence[float]
                         ) -> None:
    """solve_runtime.txt per-step solver timing (fea_solver.py:213-215,260)."""
    os.makedirs(fea_dir, exist_ok=True)
    with open(os.path.join(fea_dir, "solve_runtime.txt"), "w") as f:
        f.write("step, runtime_s\n")
        for i, t in enumerate(per_step_seconds):
            f.write(f"{i + 1}, {t:.6f}\n")


# our PC vocabulary -> the closest reference PETSc PC
# (src/fea_petsc_solverAndPC.cpp:223): tree is the factorization-grade PC
# (icc), coarse the two-level/multigrid one (gamg), block_jacobi the
# block-relaxation one (sor)
PC_REF_ALIASES = {"tree": "icc", "coarse": "gamg", "block_jacobi": "sor",
                  "jacobi": "jacobi", "none": "none"}


def write_sweep_results(path: str, rows: List[tuple]) -> None:
    """runtime_results.csv: step,solver,pc,trial,runtime_ms
    (fea_petsc_solverAndPC.cpp:221-223,371-375) plus a trailing pc_ref
    alias column mapping our PC names onto the reference's vocabulary so
    the two CSVs diff on common terms."""
    with open(path, "w") as f:
        f.write("step,solver,pc,trial,runtime_ms,pc_ref\n")
        for step, solver, pc, trial, ms in rows:
            ref = PC_REF_ALIASES.get(pc, pc)
            f.write(f"{step},{solver},{pc},{trial},{ms:.6f},{ref}\n")
