"""Solver/PC sweep harness and CLI subcommand smoke tests."""

import argparse
import os

import numpy as np
import pandas as pd
import pytest

from mycelium_tpu import scenes
from mycelium_tpu.bench.sweep import run_solver_sweep
from mycelium_tpu.config import FeaConfig
from mycelium_tpu.cli import build_parser, cmd_fea, cmd_grow


def test_sweep_schema_and_physics(tmp_path):
    sc = scenes.test_X()
    cfg = FeaConfig(dtype="float64", n_steps=4, displacement_max=0.004)
    out_csv = str(tmp_path / "runtime_results.csv")
    rows = run_solver_sweep(sc.coords, sc.conn, cfg,
                            trials=2, out_csv=out_csv)   # full 3x5 matrix
    df = pd.read_csv(out_csv)
    assert list(df.columns) == ["step", "solver", "pc", "trial",
                                "runtime_ms", "pc_ref"]
    # 4 steps x 15 combos x 2 trials (the reference's 3 KSP x 5 PC shape)
    assert len(df) == 4 * 15 * 2
    assert (df["runtime_ms"] > 0).all()
    assert set(df["solver"]) == {"cg", "bicgstab", "gmres"}
    assert set(df["pc"]) == {"tree", "coarse", "block_jacobi", "jacobi",
                             "none"}


def test_cli_grow_then_fea(tmp_path):
    parser = build_parser()
    out_dir = str(tmp_path / "run")
    args = parser.parse_args([
        "grow", "--dir", out_dir, "--steps", "4", "--capacity", "4096",
        "--snapshots", "csv", "--no-summary-plot"])
    cmd_grow(args)
    assert os.path.exists(os.path.join(out_dir, "nodes.csv"))
    assert os.path.exists(os.path.join(out_dir, "mycelium_growth_stats.csv"))
    assert os.path.exists(os.path.join(out_dir, "snapshots",
                                       "step_0000.csv"))
    stats = pd.read_csv(os.path.join(out_dir, "mycelium_growth_stats.csv"))
    assert len(stats) == 4

    args = parser.parse_args(["fea", out_dir, "--fea-steps", "4",
                              "--no-plots", "--f64"])
    cmd_fea(args)
    fea_dir = os.path.join(out_dir, "fea_results")
    for f in ["stress_record.csv", "active_elements.csv",
              "node_displacements.csv", "force_displacement.csv",
              "runtime.txt", "solve_runtime.txt"]:
        assert os.path.exists(os.path.join(fea_dir, f)), f
    fd = pd.read_csv(os.path.join(fea_dir, "force_displacement.csv"))
    assert np.isfinite(fd.to_numpy()).all()
