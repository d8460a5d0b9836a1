"""Chain-ordered operator: exact equivalence with the ELL path and solver
parity (the chain layout is a pure reordering of the same physics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mycelium_tpu import scenes
from mycelium_tpu.config import FeaConfig, archive_parity_config
from mycelium_tpu.fea.chain import (build_chain_plan, chain_apply,
                                    greedy_path_cover, plan_active_masks)
from mycelium_tpu.fea.model import apply_stiffness, build_model
from mycelium_tpu.fea.solve import solve_displacement


def random_network(n_nodes=200, extra=30, seed=0):
    """A random path-with-extra-edges graph (mycelium-shaped)."""
    rng = np.random.default_rng(seed)
    coords = rng.normal(size=(n_nodes, 3)) * 2.0
    conn = [[i, i + 1] for i in range(n_nodes - 1)]
    for _ in range(extra):
        a, b = rng.integers(0, n_nodes, 2)
        if a != b:
            conn.append([a, b])
    perm = rng.permutation(n_nodes)   # scramble node ids
    conn = perm[np.asarray(conn, np.int64)]
    coords_s = np.empty_like(coords)
    coords_s[perm] = coords
    return coords_s, conn.astype(np.int32)


def test_greedy_path_cover_is_permutation():
    coords, conn = random_network()
    perm = greedy_path_cover(conn, coords.shape[0])
    assert sorted(perm.tolist()) == list(range(coords.shape[0]))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_chain_matvec_matches_ell(seed):
    coords, conn = random_network(seed=seed)
    cfg = FeaConfig(dtype="float64", operator="chain")
    model = build_model(coords, conn, cfg)
    assert model.chain is not None
    # most edges should be chain edges after reordering
    n_jump = int((np.asarray(model.chain.jump_elem) < conn.shape[0]).sum())
    assert n_jump <= conn.shape[0] * 0.4

    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.normal(size=(model.n_nodes, 3)))
    active = jnp.asarray(rng.random(model.n_elems) > 0.3)
    ku_ell = apply_stiffness(model, u, active, "ell")
    ca, ja = plan_active_masks(model.chain, active)
    ku_chain = chain_apply(model.chain, ca, ja,
                           u[model.chain.perm])[model.chain.inv_perm]
    np.testing.assert_allclose(np.asarray(ku_chain), np.asarray(ku_ell),
                               rtol=1e-10, atol=1e-18)


def test_chain_matvec_gather_jumps_match_onehot(monkeypatch):
    """Huge meshes skip the (J, NB) one-hot jump tables (gigabytes at 1e6
    nodes) and gather/scatter the J jump rows instead — forced here via
    ONEHOT_CAP=0, must match the one-hot operator exactly."""
    import mycelium_tpu.fea.chain as chain_mod
    coords, conn = random_network(seed=3)
    cfg = FeaConfig(dtype="float64", operator="chain")
    model = build_model(coords, conn, cfg)
    monkeypatch.setattr(chain_mod, "ONEHOT_CAP", 0)
    cfg2 = FeaConfig(dtype="float64", operator="chain")
    model2 = build_model(coords, conn, cfg2)
    assert model.chain.a_blk is not None
    assert model2.chain.a_blk is None
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.normal(size=(model.n_nodes, 3)))
    active = jnp.asarray(rng.random(model.n_elems) > 0.3)
    ca, ja = plan_active_masks(model.chain, active)
    ku1 = chain_apply(model.chain, ca, ja, u[model.chain.perm])
    ca2, ja2 = plan_active_masks(model2.chain, active)
    ku2 = chain_apply(model2.chain, ca2, ja2, u[model2.chain.perm])
    np.testing.assert_allclose(np.asarray(ku2), np.asarray(ku1),
                               rtol=1e-12, atol=1e-18)
    # and the full solve path works without one-hot tables
    from mycelium_tpu.fea.ramp import anchored_mask_host
    grip = np.asarray(model2.top_nodes) | np.asarray(model2.bot_nodes)
    anch = jnp.asarray(anchored_mask_host(np.asarray(model2.conn),
                                          np.asarray(active), grip))
    scfg = FeaConfig(dtype="float64", operator="chain", precond="tree",
                     rtol=1e-10)
    m_s = build_model(coords, conn, scfg)
    assert m_s.chain.a_blk is None
    x0 = jnp.zeros((m_s.n_nodes, 3))
    res = solve_displacement(m_s, active, 0.01, -0.01, x0, scfg, anch)
    assert bool(res.converged)


def test_chain_matvec_on_real_scenes():
    for name in ["test_X", "test_y", "test_I"]:
        sc = scenes.SCENES[name]()
        cfg = FeaConfig(dtype="float64", operator="chain")
        model = build_model(sc.coords, sc.conn, cfg)
        rng = np.random.default_rng(0)
        u = jnp.asarray(rng.normal(size=(model.n_nodes, 3)))
        active = jnp.ones((model.n_elems,), bool)
        ku_ell = apply_stiffness(model, u, active, "ell")
        ca, ja = plan_active_masks(model.chain, active)
        ku_chain = chain_apply(model.chain, ca, ja,
                               u[model.chain.perm])[model.chain.inv_perm]
        np.testing.assert_allclose(np.asarray(ku_chain), np.asarray(ku_ell),
                                   rtol=1e-10, atol=1e-18)


@pytest.mark.parametrize("scene_name", ["test_I", "test_X"])
def test_chain_solve_matches_ell_solve(scene_name):
    sc = scenes.SCENES[scene_name]()
    cfg_e = archive_parity_config(operator="ell")
    cfg_c = archive_parity_config(operator="chain")
    model_e = build_model(sc.coords, sc.conn, cfg_e)
    model_c = build_model(sc.coords, sc.conn, cfg_c)
    active = jnp.ones((model_e.n_elems,), bool)
    x0 = jnp.zeros((model_e.n_nodes, 3), jnp.float64)
    res_e = solve_displacement(model_e, active, 0.01, -0.01, x0, cfg_e)
    res_c = solve_displacement(model_c, active, 0.01, -0.01, x0, cfg_c)
    assert bool(res_c.converged)
    assert np.linalg.norm(np.asarray(res_c.x - res_e.x)) < 1e-6


def test_chain_solve_growth_mesh_with_fracture():
    from mycelium_tpu.config import GrowthConfig
    from mycelium_tpu.growth import run_growth
    from mycelium_tpu.growth.export import state_mesh
    gcfg = GrowthConfig(t_steps=8, max_segments=4096, max_hyphae=2048)
    st, _, _ = run_growth(gcfg)
    coords, conn = state_mesh(st)
    cfg_e = FeaConfig(dtype="float64", rtol=1e-12, operator="ell")
    cfg_c = FeaConfig(dtype="float64", rtol=1e-12, operator="chain")
    model_e = build_model(coords, conn, cfg_e)
    model_c = build_model(coords, conn, cfg_c)
    rng = np.random.default_rng(1)
    active = jnp.asarray(rng.random(model_e.n_elems) > 0.2)
    from mycelium_tpu.fea.ramp import anchored_mask_host
    grip = np.asarray(model_e.top_nodes) | np.asarray(model_e.bot_nodes)
    anchored = jnp.asarray(anchored_mask_host(
        np.asarray(model_e.conn), np.asarray(active), grip))
    x0 = jnp.zeros((model_e.n_nodes, 3), jnp.float64)
    res_e = solve_displacement(model_e, active, 0.005, -0.005, x0, cfg_e,
                               anchored)
    res_c = solve_displacement(model_c, active, 0.005, -0.005, x0, cfg_c,
                               anchored)
    assert bool(res_c.converged)
    assert np.linalg.norm(np.asarray(res_c.x - res_e.x)) < 1e-6
