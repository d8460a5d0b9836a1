"""Growth driver: statistical parity with the reference runs, the 3D
variant, geometry export, and the coupled growth->FEA pipeline.

Growth parity is statistical, not trajectory-exact: the reference's own
Python and C++ sims share constants but not RNG streams and differ ~10% in
final network size (SURVEY.md §2.5.15); the bands below bracket both
reference runs with margin.
"""

import os

import numpy as np
import pytest

from conftest import load_ref_csv
from mycelium_tpu.config import FeaConfig, GrowthConfig, growth_3d_config
from mycelium_tpu.growth import run_growth
from mycelium_tpu.growth.export import (export_state_geometry,
                                        segments_to_host, state_mesh)
from mycelium_tpu.growth.state import ACTIVE, EMPTY
from mycelium_tpu.growth.step import run_growth_scan
from mycelium_tpu.io import read_mesh_dir


@pytest.fixture(scope="module")
def growth_150():
    cfg = GrowthConfig()   # reference defaults: 150 steps, 25 sites x 10
    st, ea, hist = run_growth(cfg)
    return cfg, st, hist


def test_growth_statistical_parity_150_steps(growth_150, ref_results):
    cfg, st, hist = growth_150
    final = hist[-1]
    # reference finals: Python 1,811 hyphae / 7,504 seg / 375.2 mm;
    # C++ 1,631 / 6,778 / 338.9 mm (BASELINE.md)
    assert 1200 <= final["hyphae"] <= 2600, final
    assert 5000 <= final["segments"] <= 10500, final
    assert 250 <= final["total_length_mm"] <= 525, final
    assert 200 <= final["anastomosed"] <= 900, final
    # structural identities
    assert final["segments"] == (final["active_tips"]
                                 + final["passive_tips"]
                                 + final["anastomosed"])
    assert final["branches"] == final["hyphae"] - cfg.n_inoculum
    assert not bool(np.asarray(st.overflow))
    # monotone growth
    segs = np.array([h["segments"] for h in hist])
    assert (np.diff(segs) >= 0).all()


def test_growth_trajectory_shape_vs_reference(growth_150, ref_results):
    """The per-step segment-count curve should track the reference curve
    within a broad band at a few checkpoints (same model constants)."""
    _, _, hist = growth_150
    ref = load_ref_csv(os.path.join(
        ref_results, "sim_20251117_181147_cpp",
        "mycelium_growth_stats.csv"))
    ref_segments = ref[:, 1]
    ours = np.array([h["segments"] for h in hist])
    for t in (0, 19, 59, 99, 149):
        assert 0.5 * ref_segments[t] <= ours[t] <= 2.0 * ref_segments[t], \
            f"step {t}: ours {ours[t]} vs ref {ref_segments[t]}"


def test_growth_state_invariants(growth_150):
    cfg, st, _ = growth_150
    state = np.asarray(st.state)
    prev = np.asarray(st.prev)
    hypha = np.asarray(st.hypha)
    tip = np.asarray(st.tip)
    n_seg = int(st.n_seg)
    n_hyp = int(st.n_hyp)
    alive = state != EMPTY
    # slots beyond n_seg are empty; all below are alive
    assert not alive[n_seg:].any()
    assert alive[:n_seg].all()
    # every hypha's tip slot is alive and belongs to that hypha
    used = np.arange(len(tip)) < n_hyp
    assert (tip[used] >= 0).all()
    assert (hypha[tip[used]] == np.arange(n_hyp)).all()
    # predecessors belong to the same hypha
    has_prev = prev >= 0
    assert (hypha[prev[has_prev]] == hypha[has_prev]).all()
    # active segments are exactly the active tip slots
    active_slots = set(np.nonzero(state == ACTIVE)[0].tolist())
    tips_active = {int(t) for t in tip[used] if state[t] == ACTIVE}
    assert active_slots == tips_active
    # geometry: wall confinement is soft in the reference too — a tip whose
    # corner projection fails within 3 iterations can grow straight through
    # the finite-thickness wall (the archived reference mesh
    # sim_20251117_181147 has 13 of 7,375 nodes beyond the dish, max
    # |x| = 3.06). Assert the same order of leakage, not perfection.
    end = np.asarray(st.end)[alive]
    frac_out = (np.abs(end[:, :2]) > cfg.dish_size / 2 + 1e-5).any(
        axis=1).mean()
    assert frac_out < 0.01, f"leak fraction {frac_out:.4f}"


def test_growth_scan_matches_loop_driver():
    cfg = GrowthConfig(t_steps=10, max_segments=4096, max_hyphae=2048)
    st1, _, h1 = run_growth(cfg)
    st2, _, h2 = run_growth_scan(cfg)
    assert h1 == h2
    np.testing.assert_array_equal(np.asarray(st1.state),
                                  np.asarray(st2.state))
    np.testing.assert_allclose(np.asarray(st1.end), np.asarray(st2.end))


def test_growth_chunked_matches_scan_driver():
    """The bounded-dispatch driver (xlarge path) is bit-identical to the
    one-program scan: the chunk boundary only moves the carry through the
    host queue. Chunk 4 over 10 steps covers the uneven-tail case."""
    from mycelium_tpu.growth.step import run_growth_chunked
    cfg = GrowthConfig(t_steps=10, max_segments=4096, max_hyphae=2048)
    st1, _, h1 = run_growth_scan(cfg)
    st2, _, h2 = run_growth_chunked(cfg, chunk_steps=4)
    assert h1 == h2
    np.testing.assert_array_equal(np.asarray(st1.state),
                                  np.asarray(st2.state))
    np.testing.assert_array_equal(np.asarray(st1.end), np.asarray(st2.end))
    np.testing.assert_array_equal(np.asarray(st1.key), np.asarray(st2.key))


def test_growth_3d_variant():
    cfg = growth_3d_config(max_segments=8192, max_hyphae=4096)
    st, ea, hist = run_growth(cfg)
    final = hist[-1]
    assert final["segments"] > 6 * 10          # grew beyond the inoculum
    assert final["branches"] == final["hyphae"] - 6
    # genuinely 3D directions
    starts, ends, _, _, _ = segments_to_host(st)
    assert np.abs(ends[:, 2]).max() > 1e-3
    # z-walls confine the network to the dish height (+wall slack)
    assert np.abs(ends[:, 2]).max() <= cfg.height / 2 + cfg.wall_thickness


def test_export_and_coupled_fea(tmp_path, growth_150):
    """The full reference pipeline: grow -> export CSV -> read back -> FEA
    (run_all.slurm's two-stage flow), on a reduced ramp for speed."""
    cfg, st, _ = growth_150
    out = str(tmp_path / "sim_test")
    export_state_geometry(st, out)
    coords, conn = read_mesh_dir(out)
    coords2, conn2 = state_mesh(st)
    np.testing.assert_allclose(coords, coords2)
    np.testing.assert_array_equal(conn, conn2)
    # dedup correctness: shared endpoints map to shared node ids
    starts, ends, _, _, _ = segments_to_host(st)
    assert conn.max() < coords.shape[0]
    np.testing.assert_allclose(coords[conn[:, 0]], starts, atol=5e-7)
    np.testing.assert_allclose(coords[conn[:, 1]], ends, atol=5e-7)
    # a segment's end and its successor's start share a node id
    n_shared = (conn[1:, 0] == conn[:-1, 1]).sum()
    assert n_shared > 0

    from mycelium_tpu.fea import run_ramp
    fea_cfg = FeaConfig(n_steps=5, dtype="float64", rtol=1e-8)
    res = run_ramp(coords, conn, fea_cfg)
    assert res.disp_record.shape[0] == 5
    assert np.isfinite(res.force_disp).all()
    assert res.force_disp[1:, 1].max() > 0     # the network carries load
