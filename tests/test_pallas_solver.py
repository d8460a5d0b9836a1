"""Whole-solve Pallas kernel: equivalence with the XLA chain solver.

On CPU the kernel runs in Pallas interpret mode, which executes the same
kernel program (rolls, one-hot MXU selections, two-level preconditioner,
while-loop CG) with identical semantics.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mycelium_tpu.config import FeaConfig, GrowthConfig
from mycelium_tpu.fea.model import build_model
from mycelium_tpu.fea.ramp import anchored_mask_host
from mycelium_tpu.fea.solve import solve_displacement


@pytest.fixture(scope="module")
def growth_mesh():
    from mycelium_tpu.growth import run_growth
    from mycelium_tpu.growth.export import state_mesh
    cfg = GrowthConfig(t_steps=10, max_segments=4096, max_hyphae=2048,
                       dtype="float32")
    st, _, _ = run_growth(cfg)
    return state_mesh(st)


def _solve_both(coords, conn, active_np, dy=0.01):
    cfg_p = FeaConfig(dtype="float32", rtol=1e-6, operator="chain",
                      use_pallas=True)
    cfg_x = dataclasses.replace(cfg_p, use_pallas=False)
    model_p = build_model(coords, conn, cfg_p)
    model_x = build_model(coords, conn, cfg_x)
    assert model_p.chain_packed is not None
    grip = np.asarray(model_p.top_nodes) | np.asarray(model_p.bot_nodes)
    anchored = jnp.asarray(anchored_mask_host(
        np.asarray(model_p.conn), active_np, grip))
    active = jnp.asarray(active_np)
    x0 = jnp.zeros((model_p.n_nodes, 3), jnp.float32)
    res_p = solve_displacement(model_p, active, dy, -dy, x0, cfg_p, anchored)
    res_x = solve_displacement(model_x, active, dy, -dy, x0, cfg_x, anchored)
    return res_p, res_x


def test_pallas_solve_matches_xla_chain(growth_mesh):
    coords, conn = growth_mesh
    res_p, res_x = _solve_both(coords, conn,
                               np.ones(conn.shape[0], bool))
    assert bool(res_p.converged)
    xp, xx = np.asarray(res_p.x), np.asarray(res_x.x)
    assert np.linalg.norm(xx) > 0
    rel = np.linalg.norm(xp - xx) / max(np.linalg.norm(xx), 1e-30)
    assert rel < 1e-4, f"rel {rel:.2e}"


def test_pallas_solve_with_fracture(growth_mesh):
    coords, conn = growth_mesh
    rng = np.random.default_rng(0)
    active_np = rng.random(conn.shape[0]) > 0.3
    res_p, res_x = _solve_both(coords, conn, active_np)
    assert bool(res_p.converged)
    xp, xx = np.asarray(res_p.x), np.asarray(res_x.x)
    rel = np.linalg.norm(xp - xx) / max(np.linalg.norm(xx), 1e-30)
    assert rel < 1e-4, f"rel {rel:.2e}"


def test_pallas_linear_coarse_basis(growth_mesh):
    coords, conn = growth_mesh
    cfg = FeaConfig(dtype="float32", rtol=1e-6, operator="chain",
                    use_pallas=True, coarse_basis="linear")
    cfg_x = dataclasses.replace(cfg, use_pallas=False)
    model = build_model(coords, conn, cfg)
    model_x = build_model(coords, conn, cfg_x)
    active = jnp.ones((model.n_elems,), bool)
    x0 = jnp.zeros((model.n_nodes, 3), jnp.float32)
    res = solve_displacement(model, active, 0.01, -0.01, x0, cfg)
    ref = solve_displacement(model_x, active, 0.01, -0.01, x0, cfg_x)
    assert bool(res.converged)
    rel = np.linalg.norm(np.asarray(res.x - ref.x)) / \
        max(np.linalg.norm(np.asarray(ref.x)), 1e-30)
    assert rel < 1e-4


def test_pallas_tree_kernel_matches_xla_tree():
    """Whole-solve kernel with the in-kernel spanning-forest PC (interpret
    mode on CPU) against the XLA tree-PC path, intact and fractured."""
    from tests.test_tree_pc import random_forest_mesh
    from mycelium_tpu.fea.ramp import anchored_mask_host

    coords, conn = random_forest_mesh(n_nodes=260, n_extra=8, seed=11)
    base = dict(dtype="float32", operator="chain", grip_length=0.1,
                rtol=1e-6, precond="tree", warm_start=False)
    cfg_x = FeaConfig(use_pallas=False, **base)
    cfg_p = FeaConfig(use_pallas=True, **base)
    mx = build_model(coords, conn, cfg_x)
    mp = build_model(coords, conn, cfg_p)
    assert mp.tree_packed is not None
    rng = np.random.default_rng(0)
    for frac in (0.0, 0.12):
        act_np = rng.random(mx.n_elems) > frac
        grip = np.asarray(mx.top_nodes) | np.asarray(mx.bot_nodes)
        anch = jnp.asarray(anchored_mask_host(np.asarray(mx.conn), act_np,
                                              grip))
        active = jnp.asarray(act_np)
        x0 = jnp.zeros((mx.n_nodes, 3), jnp.float32)
        rx = solve_displacement(mx, active, 0.01, -0.01, x0, cfg_x, anch)
        rp = solve_displacement(mp, active, 0.01, -0.01, x0, cfg_p, anch)
        assert bool(rx.converged) and bool(rp.converged)
        scale = max(float(jnp.abs(rx.x).max()), 1e-30)
        err = float(jnp.abs(rp.x - rx.x).max()) / scale
        assert err < 5e-4, (frac, err)


def test_vmem_estimator_and_gate():
    """tree_kernel_vmem_bytes must track the actual packed table bytes, and
    build_model must demote to the XLA path when the budget is exceeded."""
    from tests.test_tree_pc import random_forest_mesh
    from mycelium_tpu.fea.pallas_tree import tree_kernel_vmem_bytes
    from mycelium_tpu.fea.tree import build_tree_schedule

    coords, conn = random_forest_mesh(n_nodes=260, n_extra=8, seed=3)
    base = dict(dtype="float32", operator="chain", grip_length=0.1,
                precond="tree")
    m = build_model(coords, conn, FeaConfig(use_pallas=True, **base))
    assert m.tree_packed is not None
    # estimate (tables + scratch) must cover the real table bytes without
    # wild overshoot
    y = np.asarray(coords)[:, 1]
    free = ~((np.abs(y - y.max()) < 0.1) | (np.abs(y - y.min()) < 0.1))
    sched = build_tree_schedule(np.asarray(conn), len(coords), free)
    est = tree_kernel_vmem_bytes(sched, len(coords))
    actual = sum(np.asarray(a).nbytes for a in m.tree_packed[:-3])
    assert actual <= est <= 4 * actual + (1 << 20)
    # a tiny budget must disable the kernel tables but keep the solve path
    m_small = build_model(coords, conn, FeaConfig(
        use_pallas=True, pallas_vmem_limit_mb=0.001, **base))
    assert m_small.tree_packed is None and m_small.chain_packed is None
    from mycelium_tpu.fea.ramp import anchored_mask_host
    grip = np.asarray(m_small.top_nodes) | np.asarray(m_small.bot_nodes)
    anch = jnp.asarray(anchored_mask_host(
        np.asarray(m_small.conn), np.ones(m_small.n_elems, bool), grip))
    active = jnp.ones((m_small.n_elems,), bool)
    x0 = jnp.zeros((m_small.n_nodes, 3), jnp.float32)
    cfg = FeaConfig(use_pallas=True, pallas_vmem_limit_mb=0.001,
                    rtol=1e-6, **base)
    res = solve_displacement(m_small, active, 0.01, -0.01, x0, cfg, anch)
    ref = solve_displacement(m, active, 0.01, -0.01, x0,
                             FeaConfig(use_pallas=True, rtol=1e-6, **base),
                             anch)
    assert bool(res.converged)
    scale = max(float(jnp.abs(ref.x).max()), 1e-30)
    assert float(jnp.abs(res.x - ref.x).max()) / scale < 5e-4


def test_hybrid_big_kernel_matches_xla_tree():
    """The large-mesh hybrid path (XLA factorization + whole-CG kernel,
    pallas_tree_big) must match the XLA tree-PC path. Forced by moving the
    packed tables to the tree_packed_big slot."""
    from tests.test_tree_pc import random_forest_mesh
    from mycelium_tpu.fea.ramp import anchored_mask_host

    coords, conn = random_forest_mesh(n_nodes=260, n_extra=8, seed=11)
    base = dict(dtype="float32", operator="chain", grip_length=0.1,
                rtol=1e-6, precond="tree", warm_start=False)
    cfg_x = FeaConfig(use_pallas=False, **base)
    cfg_p = FeaConfig(use_pallas=True, **base)
    mx = build_model(coords, conn, cfg_x)
    mp = build_model(coords, conn, cfg_p)
    assert mp.tree_packed is not None
    mp = mp._replace(tree_packed=None, tree_packed_big=mp.tree_packed)
    rng = np.random.default_rng(0)
    for frac in (0.0, 0.12):
        act_np = rng.random(mx.n_elems) > frac
        grip = np.asarray(mx.top_nodes) | np.asarray(mx.bot_nodes)
        anch = jnp.asarray(anchored_mask_host(np.asarray(mx.conn), act_np,
                                              grip))
        active = jnp.asarray(act_np)
        x0 = jnp.zeros((mx.n_nodes, 3), jnp.float32)
        rx = solve_displacement(mx, active, 0.01, -0.01, x0, cfg_x, anch)
        rp = solve_displacement(mp, active, 0.01, -0.01, x0, cfg_p, anch)
        assert bool(rx.converged) and bool(rp.converged)
        scale = max(float(jnp.abs(rx.x).max()), 1e-30)
        err = float(jnp.abs(rp.x - rx.x).max()) / scale
        assert err < 5e-4, (frac, err)


@pytest.mark.parametrize("kblk,basis,frac", [(1, "linear", 0.0),
                                             (2, "linear", 0.15),
                                             (1, "const", 0.1)])
def test_coarse_matrix_chain_matches_scatter(growth_mesh, kblk, basis,
                                             frac):
    """The chain-banded coarse Galerkin assembly must equal the original
    element-scatter assembly (same matrix up to summation roundoff) —
    including under fracture, extra pins, multi-block clusters and both
    basis choices."""
    from mycelium_tpu.fea.pallas_cg import (_coarse_matrix_chain,
                                            _coarse_matrix_scatter,
                                            plan_nb)
    coords, conn = growth_mesh
    cfg = FeaConfig(dtype="float32", operator="chain", use_pallas=False,
                    coarse_basis=basis)
    model = build_model(coords, conn, cfg)
    rng = np.random.default_rng(7)
    active = jnp.asarray(rng.random(model.n_elems) > frac)
    free = jnp.asarray(np.asarray(model.free_nodes)
                       & (rng.random(model.n_nodes) > 0.03))
    nb = plan_nb(model.n_nodes)
    a_sc = np.asarray(_coarse_matrix_scatter(model, model.chain, active,
                                             free, cfg, nb, kblk))
    a_ch = np.asarray(_coarse_matrix_chain(model, model.chain, active,
                                           free, cfg, nb, kblk))
    scale = max(np.abs(a_sc).max(), 1e-30)
    np.testing.assert_allclose(a_ch, a_sc, rtol=2e-5,
                               atol=2e-5 * scale)


def test_coarse_matrix_scatter_fallback_matches_mxu(growth_mesh):
    """Past COARSE_MXU_CAP the jump block of the coarse assembly falls
    back to the 36-entries-per-jump scatter (the MXU incidence X reached
    7.9 GB on the 488k-jump xlarge coupled mesh — HBM OOM found in
    round 5); both branches must build the same matrix."""
    import mycelium_tpu.fea.pallas_cg as pcg_mod
    from mycelium_tpu.fea.pallas_cg import _coarse_matrix_chain, plan_nb
    coords, conn = growth_mesh
    cfg = FeaConfig(dtype="float64", operator="chain", use_pallas=False)
    model = build_model(coords, conn, cfg)
    rng = np.random.default_rng(11)
    active = jnp.asarray(rng.random(model.n_elems) > 0.2)
    free = model.free_nodes
    nb = plan_nb(model.n_nodes)
    a_mxu = np.asarray(_coarse_matrix_chain(model, model.chain, active,
                                            free, cfg, nb, 1))
    old_cap = pcg_mod.COARSE_MXU_CAP
    try:
        pcg_mod.COARSE_MXU_CAP = 0
        a_sc = np.asarray(_coarse_matrix_chain(model, model.chain, active,
                                               free, cfg, nb, 1))
    finally:
        pcg_mod.COARSE_MXU_CAP = old_cap
    scale = max(np.abs(a_sc).max(), 1e-30)
    np.testing.assert_allclose(a_mxu, a_sc, rtol=2e-5, atol=2e-5 * scale)
