"""Checkpoint/resume: a resumed growth run must continue the exact
trajectory of an uninterrupted run (the PRNG key travels in the state)."""

import numpy as np

from mycelium_tpu.config import GrowthConfig
from mycelium_tpu.growth import run_growth
from mycelium_tpu.io.checkpoint import (load_growth_state, load_ramp_state,
                                        save_growth_state, save_ramp_state)

CFG = GrowthConfig(t_steps=14, max_segments=4096, max_hyphae=2048)


def test_growth_resume_bit_identical(tmp_path):
    ckpt = str(tmp_path / "growth.npz")

    st_full, _, hist_full = run_growth(CFG)

    cfg_half = GrowthConfig(**{**CFG.__dict__, "t_steps": 7})
    st_half, _, hist_half = run_growth(cfg_half)
    save_growth_state(ckpt, st_half)

    st_loaded = load_growth_state(ckpt)
    assert int(st_loaded.step) == 7
    st_res, _, hist_res = run_growth(CFG, initial_state=st_loaded)

    assert hist_half + hist_res == [
        {**h, "step": h["step"]} for h in hist_full]
    np.testing.assert_array_equal(np.asarray(st_res.state),
                                  np.asarray(st_full.state))
    np.testing.assert_array_equal(np.asarray(st_res.end),
                                  np.asarray(st_full.end))
    np.testing.assert_array_equal(np.asarray(st_res.key),
                                  np.asarray(st_full.key))
    assert int(st_res.n_seg) == int(st_full.n_seg)


def test_growth_checkpoint_every(tmp_path):
    ckpt = str(tmp_path / "auto.npz")
    run_growth(GrowthConfig(**{**CFG.__dict__, "t_steps": 6}),
               checkpoint_path=ckpt, checkpoint_every=3)
    st = load_growth_state(ckpt)
    assert int(st.step) == 6


def test_ramp_state_roundtrip(tmp_path):
    path = str(tmp_path / "ramp.npz")
    rng = np.random.default_rng(0)
    active = rng.random(50) > 0.5
    u = rng.normal(size=(30, 3))
    recs = {"force": rng.normal(size=(5, 2))}
    save_ramp_state(path, 5, active, u, recs)
    step, active2, u2, recs2 = load_ramp_state(path)
    assert step == 5
    np.testing.assert_array_equal(active, active2)
    np.testing.assert_allclose(u, u2)
    np.testing.assert_allclose(recs["force"], recs2["force"])


def test_ramp_resume_equality(tmp_path):
    """Interrupt the ramp mid-way, resume from the checkpoint, and get the
    same records as one uninterrupted run (VERDICT r1 item 10)."""
    from mycelium_tpu import scenes
    from mycelium_tpu.config import archive_parity_config
    from mycelium_tpu.fea.ramp import run_ramp

    cfg = archive_parity_config(n_steps=10)
    sc = scenes.test_X()
    full = run_ramp(sc.coords, sc.conn, cfg)

    # first half with checkpointing every 2 steps -> last snapshot at the
    # stop point; then resume to the end
    ckpt = str(tmp_path / "fea_ckpt.npz")
    half_cfg = archive_parity_config(n_steps=10)
    # simulate the interruption by checkpointing and cutting at step 6:
    run_ramp(sc.coords, sc.conn, half_cfg, checkpoint_path=ckpt,
             checkpoint_every=6)   # snapshot written after step 6
    res = run_ramp(sc.coords, sc.conn, cfg, resume_from=ckpt)

    np.testing.assert_array_equal(full.active_record, res.active_record)
    np.testing.assert_allclose(full.disp_record, res.disp_record,
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(full.force_disp, res.force_disp,
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(full.stress_record, res.stress_record,
                               rtol=0, atol=1e-12)
