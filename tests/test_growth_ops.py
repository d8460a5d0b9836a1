"""Unit tests for the growth operators against scalar numpy oracles that
independently implement the reference semantics (SURVEY.md §2 C5-C10)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mycelium_tpu.config import GrowthConfig
from mycelium_tpu.growth import init_state
from mycelium_tpu.growth.neighbors import (detect_anastomosis,
                                           point_segment_distance)
from mycelium_tpu.growth.ops import (enforce_walls, grow, translocate,
                                     uptake)
from mycelium_tpu.growth.state import (ACTIVE, ANASTOMOSED, EMPTY, PASSIVE,
                                       EnvArrays, state_env_arrays)
from mycelium_tpu.scenes import petri_dish

CFG = GrowthConfig(max_segments=256, max_hyphae=128, h0_per_point=2,
                   inoculum_nx=2, inoculum_ny=2)


def tiny_state(cfg=CFG):
    st, ea = init_state(cfg)
    return st, ea


def build_chain(cfg, subs, h0=0.05):
    """A single hypha laid along +x with given per-segment substrate."""
    st, ea = init_state(cfg)
    n = len(subs)
    start = np.zeros((cfg.max_segments, 3))
    end = np.zeros((cfg.max_segments, 3))
    for i in range(n):
        start[i] = [i * h0, 0, 0]
        end[i] = [(i + 1) * h0, 0, 0]
    state = np.zeros(cfg.max_segments, np.int8)
    state[:n] = PASSIVE
    state[n - 1] = ACTIVE
    prev = np.full(cfg.max_segments, -1, np.int32)
    prev[1:n] = np.arange(n - 1)
    sub = np.zeros(cfg.max_segments)
    sub[:n] = subs
    hypha = np.full(cfg.max_segments, -1, np.int32)
    hypha[:n] = 0
    tip = np.full(cfg.max_hyphae, -1, np.int32)
    tip[0] = n - 1
    st = st._replace(
        start=jnp.asarray(start, st.start.dtype),
        end=jnp.asarray(end, st.end.dtype),
        sub=jnp.asarray(sub, st.sub.dtype),
        state=jnp.asarray(state),
        prev=jnp.asarray(prev),
        hypha=jnp.asarray(hypha),
        tip=jnp.asarray(tip),
        n_seg=jnp.asarray(n, jnp.int32),
        n_hyp=jnp.asarray(1, jnp.int32),
        phi=jnp.zeros_like(st.phi),
        theta=jnp.full_like(st.theta, np.pi / 2),
    )
    return st, ea


def translocate_oracle(subs, lengths, cfg):
    """Reference translocation semantics (mycelium_sim_2D.py:275-310):
    collect clamped deltas for each (pred, succ) pair, then apply additively
    with a clamp after each update."""
    subs = list(map(float, subs))
    updates = []
    for j in range(1, len(subs)):
        pred, s = j - 1, j
        denom = (lengths[s] + lengths[pred]) / 2.0
        if denom <= 0:
            continue
        delta = cfg.dt * cfg.diffusion * (subs[pred] - subs[s]) / denom
        new_s = subs[s] + delta
        new_pred = subs[pred] - delta
        if new_s < 0:
            adj = -subs[s]
        elif new_s > cfg.m_cap:
            adj = cfg.m_cap - subs[s]
        elif new_pred < 0:
            adj = subs[pred]
        elif new_pred > cfg.m_cap:
            adj = cfg.m_cap - subs[pred]
        else:
            adj = delta
        updates.append((s, adj))
        updates.append((pred, -adj))
    for i, d in updates:
        subs[i] = min(max(subs[i] + d, 0.0), cfg.m_cap)
    return np.asarray(subs)


@pytest.mark.parametrize("subs", [
    [1e-6, 5e-7, 2e-7],
    [2e-6, 0.0, 2e-6, 1e-9],
    [0.0, 0.0],
    [1.9999e-6, 2e-6, 1e-12],
])
def test_translocate_matches_reference_semantics(subs):
    cfg = GrowthConfig(max_segments=64, max_hyphae=16, dtype="float64",
                       h0_per_point=1, inoculum_nx=1, inoculum_ny=1)
    st, _ = build_chain(cfg, subs)
    out = translocate(st, cfg)
    expect = translocate_oracle(subs, [cfg.h0] * len(subs), cfg)
    np.testing.assert_allclose(np.asarray(out.sub[:len(subs)]), expect,
                               rtol=1e-12, atol=1e-24)


def uptake_oracle(subs, in_mask, E, cfg, mu):
    """Reference sequential drain (mycelium_sim_2D.py:315-338)."""
    subs = list(map(float, subs))
    for i in range(len(subs)):
        if not in_mask[i]:
            continue
        theta = cfg.dt * mu * E * subs[i]
        theta = max(0.0, min(theta, min(cfg.m_cap - subs[i], E)))
        subs[i] += theta
        E -= theta
        if E <= 0:
            break
    return np.asarray(subs), E


def test_uptake_matches_sequential_drain():
    cfg = GrowthConfig(max_segments=64, max_hyphae=16, dtype="float64",
                       h0_per_point=1, inoculum_nx=1, inoculum_ny=1)
    subs = [4e-7, 1.9e-6, 0.0, 4e-7, 1e-6]
    st, ea = build_chain(cfg, subs)
    st = st._replace(env_e=jnp.asarray([2e-6], st.sub.dtype))
    out = uptake(st, ea, cfg)
    in_mask = np.ones(len(subs), bool)  # chain lies inside the dish substrate
    expect, e_left = uptake_oracle(subs, in_mask, 2e-6, cfg,
                                   cfg.substrate_mu)
    np.testing.assert_allclose(np.asarray(out.sub[:len(subs)]), expect,
                               rtol=1e-12)
    # XLA may fuse the theta product into FMAs, so the drained E differs
    # from the python oracle at the last-ulp level; bound by the E floor
    np.testing.assert_allclose(float(out.env_e[0]), e_left, rtol=1e-9,
                               atol=2e-18)


@pytest.mark.parametrize("e0", [2e-6, 1e-10, 3e-14])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_uptake_both_paths_match_reference_oracle(seed, e0):
    """Anchor BOTH in-repo uptake implementations (the serial while_loop
    and the run-parallel drain) to the floor-free numpy transcription of
    the reference (mycelium_sim_2D.py:315-338, `uptake_oracle` above) —
    not merely to each other. Random states exercise every clamp regime:
    saturated segments (s == m_cap), near-cap segments, zeros, and E
    budgets from plentiful down to exhaustion-scale."""
    from mycelium_tpu.growth.ops import uptake_loop
    cfg = GrowthConfig(max_segments=64, max_hyphae=16, dtype="float64",
                       h0_per_point=1, inoculum_nx=1, inoculum_ny=1)
    rng = np.random.default_rng(seed)
    n = 24
    subs = rng.uniform(0.0, cfg.m_cap, n)
    subs[rng.uniform(size=n) < 0.2] = cfg.m_cap       # exact saturation
    subs[rng.uniform(size=n) < 0.1] = 0.0
    st, ea = build_chain(cfg, subs)
    st = st._replace(env_e=jnp.asarray([e0], st.sub.dtype))
    expect, e_exp = uptake_oracle(subs, np.ones(n, bool), e0, cfg,
                                  cfg.substrate_mu)
    for fn in (uptake_loop, uptake):
        out = fn(st, ea, cfg)
        np.testing.assert_allclose(np.asarray(out.sub[:n]), expect,
                                   rtol=1e-11, atol=1e-28)
        np.testing.assert_allclose(float(out.env_e[0]), e_exp, rtol=1e-9,
                                   atol=2e-18)


def test_uptake_floor_deviation_is_bounded():
    """The ONE documented deviation from the reference: both uptake paths
    stop once E <= UPTAKE_E_FLOOR (1e-18 mol) while the reference drains
    until exactly E <= 0 — which never happens in exact arithmetic (E
    decays geometrically). Drive E through the floor mid-drain and check
    the tail segments' deficit vs the floor-free reference oracle stays
    below the analytic bound theta <= dt*mu*floor*s (~1e-12 relative)."""
    from mycelium_tpu.growth.ops import UPTAKE_E_FLOOR, uptake_loop
    cfg = GrowthConfig(max_segments=64, max_hyphae=16, dtype="float64",
                       h0_per_point=1, inoculum_nx=1, inoculum_ny=1)
    # decay factor per segment: 1 - dt*mu*s = 0.01  ->  E falls 100x per
    # segment; E0 = 1e-16 crosses the 1e-18 floor after two segments, so
    # the reference keeps draining where our loops have stopped
    subs = [9.9e-7] * 6
    e0 = 1e-16
    st, ea = build_chain(cfg, subs)
    st = st._replace(env_e=jnp.asarray([e0], st.sub.dtype))
    expect, _ = uptake_oracle(subs, np.ones(len(subs), bool), e0, cfg,
                              cfg.substrate_mu)
    assert np.any(expect > np.asarray(subs))  # the oracle did drain
    bound = cfg.dt * cfg.substrate_mu * UPTAKE_E_FLOOR  # max relative theta
    for fn in (uptake_loop, uptake):
        out = fn(st, ea, cfg)
        got = np.asarray(out.sub[:len(subs)])
        rel = np.abs(got - expect) / expect
        assert np.all(rel <= bound), rel


def test_uptake_order_dependence_is_slot_order():
    """First slots drain E first — the documented deterministic order."""
    cfg = GrowthConfig(max_segments=64, max_hyphae=16, dtype="float64",
                       h0_per_point=1, inoculum_nx=1, inoculum_ny=1)
    subs = [1.9999e-6] * 4   # each take ~theta until E exhausted
    st, ea = build_chain(cfg, subs)
    st = st._replace(env_e=jnp.asarray([1e-10], st.sub.dtype))
    out = uptake(st, ea, cfg)
    gains = np.asarray(out.sub[:4]) - np.asarray(subs)
    assert gains[0] > 0
    assert gains[0] >= gains[1] >= gains[2]


def test_grow_no_substrate_no_growth():
    cfg = GrowthConfig(max_segments=64, max_hyphae=16, dtype="float64",
                       h0_per_point=1, inoculum_nx=1, inoculum_ny=1)
    st, _ = build_chain(cfg, [0.0, 0.0])
    out = grow(st, cfg, jax.random.PRNGKey(0))
    assert int(out.n_seg) == int(st.n_seg)
    assert int(out.state[1]) == ACTIVE  # tip unchanged


def test_grow_extension_bookkeeping():
    cfg = GrowthConfig(max_segments=64, max_hyphae=16, dtype="float64",
                       h0_per_point=1, inoculum_nx=1, inoculum_ny=1,
                       p_branch=0.0)
    subs = [0.0, 1e-6]
    st, _ = build_chain(cfg, subs)
    out = grow(st, cfg, jax.random.PRNGKey(1))
    assert int(out.n_seg) == 3
    assert int(out.n_hyp) == 1
    assert int(out.state[1]) == PASSIVE        # old tip passive
    assert int(out.state[2]) == ACTIVE         # new tip active
    assert int(out.prev[2]) == 1
    assert int(out.tip[0]) == 2
    np.testing.assert_allclose(np.asarray(out.start[2]),
                               np.asarray(st.end[1]))
    # cost accounting: avail - cost, renormalized by tip length
    avail = subs[1] * cfg.h0
    expect_tip = (avail - cfg.c_g * cfg.h0) / cfg.h0
    np.testing.assert_allclose(float(out.sub[1]), expect_tip, rtol=1e-12)
    np.testing.assert_allclose(float(out.sub[2]), 0.5 * expect_tip,
                               rtol=1e-12)
    # new segment has length h0
    L = np.linalg.norm(np.asarray(out.end[2] - out.start[2]))
    np.testing.assert_allclose(L, cfg.h0, rtol=1e-12)


def test_grow_branching_creates_new_hypha():
    cfg = GrowthConfig(max_segments=64, max_hyphae=16, dtype="float64",
                       h0_per_point=1, inoculum_nx=1, inoculum_ny=1,
                       p_branch=1.0)
    st, _ = build_chain(cfg, [0.0, 1e-6])
    out = grow(st, cfg, jax.random.PRNGKey(2))
    assert int(out.n_seg) == 4          # extension + child
    assert int(out.n_hyp) == 2
    assert int(out.state[2]) == ACTIVE and int(out.state[3]) == ACTIVE
    assert int(out.prev[3]) == -1       # child starts a new hypha
    assert int(out.hypha[3]) == 1
    assert int(out.tip[1]) == 3
    # both children get half the post-cost concentration; cost is 2x
    avail = 1e-6 * cfg.h0
    expect_tip = (avail - 2 * cfg.c_g * cfg.h0) / cfg.h0
    np.testing.assert_allclose(float(out.sub[2]), 0.5 * expect_tip,
                               rtol=1e-12)
    np.testing.assert_allclose(float(out.sub[3]), 0.5 * expect_tip,
                               rtol=1e-12)


def test_grow_overflow_sets_flag_and_does_not_corrupt():
    cfg = GrowthConfig(max_segments=2, max_hyphae=16, dtype="float64",
                       h0_per_point=1, inoculum_nx=1, inoculum_ny=1,
                       p_branch=0.0)
    st, _ = build_chain(cfg, [0.0, 1e-6])
    out = grow(st, cfg, jax.random.PRNGKey(3))
    assert bool(out.overflow)
    assert int(out.n_seg) == 2          # clamped at capacity


def test_point_segment_distance_matches_reference_formula():
    rng = np.random.default_rng(0)
    for _ in range(20):
        p, a, b = rng.normal(size=(3, 3))
        d, proj = point_segment_distance(jnp.asarray(p), jnp.asarray(a),
                                         jnp.asarray(b))
        ap, ab = p - a, b - a
        t = np.clip(np.dot(ap, ab) / np.dot(ab, ab), 0, 1)
        proj_ref = a + t * ab
        np.testing.assert_allclose(float(d), np.linalg.norm(p - proj_ref),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(proj), proj_ref, rtol=1e-5,
                                   atol=1e-7)
    # degenerate segment: distance to the point a
    d, proj = point_segment_distance(jnp.asarray([1.0, 0, 0]),
                                     jnp.asarray([0.0, 0, 0]),
                                     jnp.asarray([0.0, 0, 0]))
    np.testing.assert_allclose(float(d), 1.0)


def test_anastomosis_snaps_active_tip():
    cfg = GrowthConfig(max_segments=64, max_hyphae=16, dtype="float64",
                       h0_per_point=1, inoculum_nx=1, inoculum_ny=1)
    st, _ = build_chain(cfg, [1e-6, 1e-6])
    # plant a foreign segment crossing just above the tip endpoint
    N = cfg.max_segments
    start = np.array(st.start)
    end = np.array(st.end)
    state = np.array(st.state)
    tip_end = end[1]                       # (0.10, 0, 0)
    start[2] = tip_end + [0.0005, -0.05, 0]
    end[2] = tip_end + [0.0005, +0.05, 0]
    state[2] = PASSIVE
    st = st._replace(start=jnp.asarray(start), end=jnp.asarray(end),
                     state=jnp.asarray(state),
                     n_seg=jnp.asarray(3, jnp.int32))
    out = detect_anastomosis(st, cfg)
    assert int(out.state[1]) == ANASTOMOSED
    np.testing.assert_allclose(np.asarray(out.end[1]),
                               tip_end + [0.0005, 0, 0], atol=1e-12)
    # and a far tip does not snap
    st_far = st._replace(end=st.end.at[2].add(jnp.asarray([0.0, 1.0, 0.0]))
                         .at[1].add(0.0))
    st_far = st_far._replace(start=st_far.start.at[2]
                             .add(jnp.asarray([0.0, 1.0, 0.0])))
    out2 = detect_anastomosis(st_far, cfg)
    assert int(out2.state[1]) == ACTIVE


def test_walls_project_penetrating_tip():
    cfg = GrowthConfig(max_segments=64, max_hyphae=16, dtype="float64",
                       h0_per_point=1, inoculum_nx=1, inoculum_ny=1)
    st, ea = build_chain(cfg, [1e-6, 1e-6])
    # move tip into the +x wall (dish half-size 2.5, wall at 2.5..2.55)
    start = np.array(st.start)
    end = np.array(st.end)
    start[1] = [2.48, 0.2, 0]
    end[1] = [2.52, 0.2, 0]   # inside the +x wall
    st = st._replace(start=jnp.asarray(start), end=jnp.asarray(end))
    L0 = float(jnp.linalg.norm(st.end[1] - st.start[1]))
    out = enforce_walls(st, ea, cfg, jax.random.PRNGKey(0))
    e = np.asarray(out.end[1])
    assert e[0] <= 2.5 + 1e-9, f"still penetrating: {e}"
    # length preserved, tangential slide (y-direction move)
    L1 = np.linalg.norm(e - np.asarray(out.start[1]))
    np.testing.assert_allclose(L1, L0, rtol=1e-9)
    assert int(out.state[1]) == ACTIVE


def test_walls_leave_interior_tips_alone():
    cfg = GrowthConfig(max_segments=64, max_hyphae=16, dtype="float64",
                       h0_per_point=1, inoculum_nx=1, inoculum_ny=1)
    st, ea = build_chain(cfg, [1e-6, 1e-6])
    out = enforce_walls(st, ea, cfg, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out.end), np.asarray(st.end))


def test_anastomosis_strategies_agree():
    """'grid' (TPU rolls) and 'window' (CPU gathers) must produce the same
    snaps on the same state."""
    from mycelium_tpu.growth.step import growth_step
    cfg = GrowthConfig(t_steps=6, max_segments=4096, max_hyphae=2048,
                       dtype="float32")
    st, ea = init_state(cfg)
    for _ in range(6):
        st = growth_step(st, ea, cfg)
    out_w = detect_anastomosis(st, cfg, strategy="window")
    out_g = detect_anastomosis(st, cfg, strategy="grid")
    np.testing.assert_array_equal(np.asarray(out_w.state),
                                  np.asarray(out_g.state))
    np.testing.assert_allclose(np.asarray(out_w.end),
                               np.asarray(out_g.end), atol=1e-7)


def test_anastomosis_cell_overflow_sets_flag():
    """Overstuffing one grid cell past max_per_cell must raise the overflow
    flag (dropped candidates were previously silent — VERDICT r1 weak #7)."""
    cfg = GrowthConfig(max_segments=64, max_hyphae=16, dtype="float64",
                       h0_per_point=1, inoculum_nx=1, inoculum_ny=1,
                       max_per_cell=4)
    st, _ = build_chain(cfg, [1e-6, 1e-6])
    start = np.array(st.start)
    end = np.array(st.end)
    state = np.array(st.state)
    # 8 tiny passive segments, all midpoints inside one 0.1 mm cell
    for i in range(8):
        start[2 + i] = [1.01 + 1e-4 * i, 1.01, 0.0]
        end[2 + i] = [1.02 + 1e-4 * i, 1.01, 0.0]
        state[2 + i] = PASSIVE
    st = st._replace(start=jnp.asarray(start), end=jnp.asarray(end),
                     state=jnp.asarray(state),
                     n_seg=jnp.asarray(10, jnp.int32))
    assert not bool(st.overflow)
    for strategy in ("window", "grid"):
        out = detect_anastomosis(st, cfg, strategy=strategy)
        assert bool(out.overflow), strategy


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_uptake_parallel_matches_while_loop(seed):
    """The run-parallel drain (cumprod/cumsum over regime runs) must match
    the literal per-segment while_loop on clamp-exercising random states
    (VERDICT r1 item 3). Random subs span [0, m_cap] so all three regimes
    (product decay, cap saturation, exhaustion) are hit."""
    from mycelium_tpu.growth.ops import uptake_loop
    cfg = GrowthConfig(max_segments=128, max_hyphae=32, dtype="float64",
                       h0_per_point=1, inoculum_nx=1, inoculum_ny=1)
    rng = np.random.default_rng(seed)
    n = 100
    subs = rng.uniform(0.0, cfg.m_cap, size=n)
    subs[rng.random(n) < 0.2] = cfg.m_cap          # saturated segments
    subs[rng.random(n) < 0.1] = 0.0                # empty segments
    st, ea = build_chain(cfg, list(subs))
    # some segments outside the substrate cuboid (drop out of the drain)
    end = np.array(st.end)
    out_mask = rng.random(n) < 0.15
    end[:n][out_mask] += 100.0
    st = st._replace(end=jnp.asarray(end),
                     env_e=jnp.asarray([rng.uniform(1e-9, 5e-6)],
                                       st.sub.dtype))
    a = uptake_loop(st, ea, cfg)
    b = uptake(st, ea, cfg)
    np.testing.assert_allclose(np.asarray(b.sub), np.asarray(a.sub),
                               rtol=1e-12, atol=1e-22)
    np.testing.assert_allclose(float(b.env_e[0]), float(a.env_e[0]),
                               rtol=1e-9, atol=2e-18)


def test_uptake_saturated_interleave():
    """Strictly alternating saturated/unsaturated segments with scarce E —
    the xlarge mid-run occupancy pattern. Saturated segments are exact
    no-ops (theta clamps to m_cap - s = 0) and must not break the regime
    runs: with them excluded the drain stays a handful of vector passes;
    the pre-fix code paid one full-capacity pass per boundary."""
    from mycelium_tpu.growth.ops import uptake_loop
    cfg = GrowthConfig(max_segments=1024, max_hyphae=256, dtype="float64",
                       h0_per_point=1, inoculum_nx=1, inoculum_ny=1)
    n = 512
    subs = np.full(n, 0.3 * cfg.m_cap)
    subs[::2] = cfg.m_cap                     # every other slot saturated
    st, ea = build_chain(cfg, list(subs))
    st = st._replace(env_e=jnp.asarray([2e-6], st.sub.dtype))
    a = uptake_loop(st, ea, cfg)
    b = uptake(st, ea, cfg)
    np.testing.assert_allclose(np.asarray(b.sub), np.asarray(a.sub),
                               rtol=1e-12, atol=1e-22)
    np.testing.assert_allclose(float(b.env_e[0]), float(a.env_e[0]),
                               rtol=1e-9, atol=2e-18)


from functools import partial


@partial(jax.jit, static_argnums=(2,))
def _step_with_grid(st, ea, cfg):
    """growth_step's exact op order with the query strategy pinned to
    'grid' (the step default would pick 'window' on CPU). Jitted like
    the production step: the eager per-primitive path additionally
    tickles a persistent-compilation-cache deserialization segfault on
    re-read of eager while_loop executables (jax 0.8 CPU)."""
    key, k_grow = jax.random.split(st.key)
    st = st._replace(key=key)
    st = translocate(st, cfg)
    st = grow(st, cfg, k_grow)
    st = detect_anastomosis(st, cfg, strategy="grid")
    st = uptake(st, ea, cfg)
    st = enforce_walls(st, ea, cfg, st.key)
    return st._replace(step=st.step + 1)


def _assert_states_equal(a, b, context=""):
    for f in ("start", "end", "theta", "phi", "sub", "state", "prev",
              "hypha", "tip", "n_seg", "n_hyp", "env_e"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)),
            err_msg=f"{context} field {f}")


def test_incremental_grid_matches_full_rebuild():
    """cfg.grid_incremental (persistent grid + tip overlay) must produce
    the same trajectory as the per-step full rebucket over a real
    multi-step run with growth, branching, anastomosis and walls."""
    import dataclasses
    cfg_f = GrowthConfig(t_steps=40, max_segments=1 << 12,
                         max_hyphae=1 << 11)
    cfg_i = dataclasses.replace(cfg_f, grid_incremental=True)
    env = petri_dish(cfg_f)
    st_f, ea = init_state(cfg_f, env)
    st_i, _ = init_state(cfg_i, env)
    assert st_i.grid is not None and st_f.grid is None
    snaps = 0
    for ti in range(cfg_f.t_steps):
        st_f = _step_with_grid(st_f, ea, cfg_f)
        st_i = _step_with_grid(st_i, ea, cfg_i)
        if ti % 8 == 7 or ti == cfg_f.t_steps - 1:
            _assert_states_equal(st_f, st_i, f"step {ti}")
    snaps = int(np.sum(np.asarray(st_f.state) == ANASTOMOSED))
    assert snaps > 0, "scene produced no anastomosis — test is vacuous"
    assert int(np.asarray(st_f.n_seg)) > 500
    assert not bool(np.asarray(st_i.overflow))


def test_incremental_grid_resume_backlog():
    """A fresh grid attached mid-trajectory (the checkpoint-resume path)
    inserts the whole backlog through the same chunked code and then
    tracks the full rebuild exactly."""
    import dataclasses
    from mycelium_tpu.growth.state import ensure_grid
    cfg_f = GrowthConfig(t_steps=30, max_segments=1 << 12,
                         max_hyphae=1 << 11, grid_update_cap=256)
    cfg_i = dataclasses.replace(cfg_f, grid_incremental=True)
    env = petri_dish(cfg_f)
    st_f, ea = init_state(cfg_f, env)
    for _ in range(15):
        st_f = _step_with_grid(st_f, ea, cfg_f)
    # resume: attach an empty grid to the midpoint state (backlog >> cap
    # exercises the chunk loop) and continue incrementally
    st_i = ensure_grid(st_f, cfg_i)
    assert int(np.asarray(st_f.n_seg)) > 256
    for _ in range(15):
        st_f = _step_with_grid(st_f, ea, cfg_f)
        st_i = _step_with_grid(st_i, ea, cfg_i)
    _assert_states_equal(st_f, st_i, "resumed")


def test_incremental_grid_cell_overflow_sets_flag():
    """Per-cell capacity overflow during incremental inserts must raise
    the state overflow flag exactly like the full rebucket does."""
    import dataclasses
    cfg = GrowthConfig(t_steps=12, max_segments=1 << 12,
                       max_hyphae=1 << 11, max_per_cell=2,
                       grid_incremental=True)
    env = petri_dish(cfg)
    st, ea = init_state(cfg, env)
    for _ in range(cfg.t_steps):
        st = _step_with_grid(st, ea, cfg)
    assert bool(np.asarray(st.overflow))


def test_anast_kernel_matches_xla_scan(monkeypatch):
    """The banded Pallas scan kernel (growth/pallas_anast.py, interpret
    mode on CPU) must reproduce the XLA chunk-loop scan exactly — same
    snapped endpoints and states over a real grown f32 state with a
    multi-band face, occupied and empty bands, and both candidate
    sources populated."""
    import dataclasses
    from mycelium_tpu.growth.step import run_growth

    cfg = GrowthConfig(t_steps=25, grid_incremental=True)
    st, _, hist = run_growth(cfg, petri_dish(cfg))
    assert np.asarray(st.start).dtype == np.float32
    assert hist[-1]["segments"] > 1000

    monkeypatch.setenv("MYC_ANAST_KERNEL", "off")
    out_x = detect_anastomosis(st, cfg)
    monkeypatch.setenv("MYC_ANAST_KERNEL", "interpret")
    out_k = detect_anastomosis(st, cfg)

    assert np.array_equal(np.asarray(out_x.end), np.asarray(out_k.end))
    assert np.array_equal(np.asarray(out_x.state), np.asarray(out_k.state))
    assert np.sum(np.asarray(out_k.state) == ANASTOMOSED) \
        >= np.sum(np.asarray(st.state) == ANASTOMOSED)


def test_anast_kernel_band_boundary_halo(monkeypatch):
    """A tip whose corner cell is the FIRST row of band 2 (row 48 of the
    54-row face; TB = 48) with its only in-tolerance candidate in row 47
    — the candidate is visible to the kernel ONLY through the DMA
    window's top halo rows (VERDICT r4 #6b: the halo/roll edge is the
    riskiest part of the banded layout and organic-growth fixtures don't
    pin a pair straddling the band boundary)."""
    import dataclasses
    from mycelium_tpu.growth.neighbors import grid_dims
    from mycelium_tpu.growth.pallas_anast import TB
    from mycelium_tpu.growth.state import ensure_grid

    cfg = GrowthConfig(max_segments=64, max_hyphae=8, h0_per_point=2,
                       inoculum_nx=2, inoculum_ny=2,
                       grid_incremental=True)
    g, gz = grid_dims(cfg)
    assert g > TB and gz == 1          # multi-band face (54 rows, 2 bands)

    st, _ = init_state(cfg)
    N, H = cfg.max_segments, cfg.max_hyphae
    start = np.zeros((N, 3)); end = np.zeros((N, 3))
    state = np.zeros(N, np.int8)
    prev = np.full(N, -1, np.int32)
    hypha = np.full(N, -1, np.int32)
    tip = np.full(H, -1, np.int32)
    # hypha 0: ACTIVE tip segment ending at x=2.0990 -> corner row
    # floor(20.990 + 0.5) + 27 = 48 (first row of band 2)
    start[0] = [2.049, 0.0, 0.0]; end[0] = [2.0990, 0.0, 0.0]
    state[0] = ACTIVE; hypha[0] = 0; tip[0] = 0
    # hypha 1: finalized vertical segment A at x=2.0995 (midpoint row
    # floor(20.995) + 27 = 47 -> last row of band 1) 5e-4 from the tip,
    # plus its extension child B (so A appears as a parent in prev[] and
    # the backlog insert puts it in the persistent grid); B's endpoints
    # are >= 0.025 away, so the winner MUST come through the halo read
    start[1] = [2.0995, -0.025, 0.0]; end[1] = [2.0995, 0.025, 0.0]
    state[1] = PASSIVE; hypha[1] = 1
    start[2] = [2.0995, 0.025, 0.0]; end[2] = [2.0995, 0.075, 0.0]
    state[2] = PASSIVE; hypha[2] = 1; prev[2] = 1; tip[1] = 2
    st = st._replace(
        start=jnp.asarray(start, st.start.dtype),
        end=jnp.asarray(end, st.end.dtype),
        state=jnp.asarray(state), prev=jnp.asarray(prev),
        hypha=jnp.asarray(hypha), tip=jnp.asarray(tip),
        n_seg=jnp.asarray(3, jnp.int32), n_hyp=jnp.asarray(2, jnp.int32))
    st = ensure_grid(st._replace(grid=None), cfg)

    monkeypatch.setenv("MYC_ANAST_KERNEL", "off")
    out_x = detect_anastomosis(st, cfg)
    monkeypatch.setenv("MYC_ANAST_KERNEL", "interpret")
    out_k = detect_anastomosis(st, cfg)

    # the kernel found the cross-band pair and snapped exactly like XLA
    assert int(np.asarray(out_k.state)[0]) == ANASTOMOSED
    np.testing.assert_array_equal(np.asarray(out_x.state),
                                  np.asarray(out_k.state))
    np.testing.assert_array_equal(np.asarray(out_x.end),
                                  np.asarray(out_k.end))
    # snap target: the projection onto segment A, x = 2.0995, y = 0
    assert abs(float(np.asarray(out_k.end)[0, 0]) - 2.0995) < 1e-6
    assert abs(float(np.asarray(out_k.end)[0, 1])) < 1e-6
