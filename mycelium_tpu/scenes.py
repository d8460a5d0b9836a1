"""Scene presets: FEA validation micro-meshes and growth environment setup.

The reference validates its solvers against four hand-authored micro-scenes
checked into results/ (SURVEY.md §4): test_I (collinear chain), test_t
(zigzag), test_y (3-armed star with a 1e-4 y-offset arm), and test_X (14
elements fanning into one center node, with duplicate coincident nodes).
Those scenes are reproduced here programmatically (geometry transcribed from
results/test_*/nodes.csv + elements.csv) so the framework is self-contained.

Growth environment geometry (inoculum grid, substrate cuboid, walls) mirrors
reference src/mycelium_sim_2D.py:43-74,630-654 and src/mycelium_sim.py:30-48,
585-600.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from .config import GrowthConfig


class Scene(NamedTuple):
    """A static FEA mesh: node coordinates and 2-node element connectivity."""
    name: str
    coords: np.ndarray  # (n_nodes, 3) float64
    conn: np.ndarray    # (n_elems, 2) int32


def _scene(name, nodes, elems) -> Scene:
    return Scene(name, np.asarray(nodes, dtype=np.float64),
                 np.asarray(elems, dtype=np.int32))


def test_I() -> Scene:
    """4 collinear nodes on the y-axis, 3 elements: pure 1-D stretch."""
    return _scene("test_I",
                  [[0, 0, 0], [0, 1, 0], [0, 2, 0], [0, 3, 0]],
                  [[0, 1], [1, 2], [2, 3]])


def test_t() -> Scene:
    """L/zigzag: 3 elements with a direction change."""
    return _scene("test_t",
                  [[0, 0, 0], [0, 1, 0], [1, 1, 0], [1, 2, 0]],
                  [[0, 1], [1, 2], [2, 3]])


def test_y() -> Scene:
    """3-armed star through the origin; one arm offset by 1e-4 in y."""
    return _scene("test_y",
                  [[0, 0, 0], [0.5, 1, 0], [0, -1, 0], [-0.5, 1.0001, 0]],
                  [[0, 1], [2, 0], [0, 3]])


def test_X() -> Scene:
    """X-shaped fan: 15 nodes (with coincident duplicates 0/1, 5/6, 8/9,
    13/14), 14 elements all meeting at center node 7."""
    nodes = [[-1, -1, 0], [-1, -1, 0], [-0.5, -1, 0], [0, -1, 0],
             [0.5, -1, 0], [1, -1, 0], [1, -1, 0],
             [0, 0, 0],
             [-1, 1, 0], [-1, 1, 0], [-0.5, 1, 0], [0, 1, 0],
             [0.5, 1, 0], [1, 1, 0], [1, 1, 0]]
    elems = [[n, 7] for n in range(7)] + [[7, n] for n in range(8, 15)]
    return _scene("test_X", nodes, elems)


SCENES = {"test_I": test_I, "test_t": test_t, "test_y": test_y,
          "test_X": test_X}

# Per-scene ramp configs that reproduce the archived results/test_* fixtures.
# Each scene was archived under a different hand-edited constant set
# (SURVEY.md §2.4 warns the archive does not match fea_solver.py defaults):
# grips are extreme-node only, and the dy ramps recovered from the archived
# node_displacements.csv are 0.06/39 (test_I, test_X), 2.0/39 (test_t), and
# 0.06/99 over 100 steps (test_y).
ARCHIVE_SCENE_CONFIGS = {
    "test_I": dict(n_steps=40, displacement_max=0.06),
    "test_t": dict(n_steps=40, displacement_max=2.0),
    "test_X": dict(n_steps=40, displacement_max=0.06),
    "test_y": dict(n_steps=100, displacement_max=0.06),
}


# ---------------------------------------------------------------------------
# Growth environment (cuboids + inoculum)
# ---------------------------------------------------------------------------

class Environment(NamedTuple):
    """Static growth environment: one substrate cuboid set + wall cuboid set.

    Cuboids are axis-aligned, given by center (K,3) and size (K,3). The
    substrate cuboids' nutrient E is *dynamic* and lives in GrowthState.
    """
    substrate_center: np.ndarray  # (S, 3)
    substrate_size: np.ndarray    # (S, 3)
    substrate_mu: np.ndarray      # (S,)
    substrate_e0: np.ndarray      # (S,) initial nutrient
    wall_center: np.ndarray       # (W, 3)
    wall_size: np.ndarray         # (W, 3)
    inoculum: np.ndarray          # (P, 3) inoculum points


def inoculum_grid(nx: int, ny: int, dist: float, z: float = 0.0,
                  centered: bool = True) -> np.ndarray:
    """Rectangular inoculum grid in the XY plane (mycelium_sim_2D.py:43-71).

    Point order matches the reference's (x-major, y-minor) nesting.
    """
    x0 = -(nx - 1) * dist / 2 if centered else 0.0
    y0 = -(ny - 1) * dist / 2 if centered else 0.0
    pts = [[x0 + i * dist, y0 + j * dist, z]
           for i in range(nx) for j in range(ny)]
    return np.asarray(pts, dtype=np.float64)


INOCULUM_POINTS_3D = np.asarray([
    [-0.5, 0.25, 0.0], [0.0, 0.25, 0.0], [0.5, 0.25, 0.0],
    [-0.5, -0.25, 0.0], [0.0, -0.25, 0.0], [0.5, -0.25, 0.0],
], dtype=np.float64)   # mycelium_sim.py:41-48 with dist_inoculum = 0.5


def petri_dish(cfg: GrowthConfig) -> Environment:
    """The reference demo environment.

    2D (mycelium_sim_2D.py:634-654): one substrate cuboid covering the dish
    plus 4 impenetrable side walls.
    3D (mycelium_sim.py:585-600): narrower substrate plus top/bottom z-walls.
    """
    ds, wt, h = cfg.dish_size, cfg.wall_thickness, cfg.height
    sub_c = np.array([[0.0, 0.0, 0.0]])
    sub_s = np.array([[ds, cfg.substrate_width, h]])
    if cfg.three_d:
        walls_c = np.array([
            [0, 0, -h / 2 - wt / 2],
            [0, 0, +h / 2 + wt / 2],
        ])
        walls_s = np.array([
            [ds, ds, wt],
            [ds, ds, wt],
        ])
        inoc = INOCULUM_POINTS_3D
    else:
        walls_c = np.array([
            [0, +ds / 2 + wt / 2, 0],
            [0, -ds / 2 - wt / 2, 0],
            [+ds / 2 + wt / 2, 0, 0],
            [-ds / 2 - wt / 2, 0, 0],
        ])
        walls_s = np.array([
            [ds, wt, wt],
            [ds, wt, wt],
            [wt, ds, wt],
            [wt, ds, wt],
        ])
        inoc = inoculum_grid(cfg.inoculum_nx, cfg.inoculum_ny,
                             cfg.dist_inoculum)
    return Environment(
        substrate_center=sub_c.astype(np.float64),
        substrate_size=sub_s.astype(np.float64),
        substrate_mu=np.full((1,), cfg.substrate_mu, dtype=np.float64),
        substrate_e0=np.full((1,), cfg.substrate_e0, dtype=np.float64),
        wall_center=walls_c.astype(np.float64),
        wall_size=walls_s.astype(np.float64),
        inoculum=inoc,
    )
