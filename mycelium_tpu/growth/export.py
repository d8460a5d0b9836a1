"""Geometry export: growth state -> nodes.csv/elements.csv (component C12).

Node deduplication happens host-side (the same principled boundary the
reference draws: growth and FEA communicate through the CSV mesh contract,
SURVEY.md §7.3). Segments are emitted in the reference's traversal order —
hyphae in creation order, chain order within each hypha — which for the
slot-allocated state is exactly a stable sort by (hypha id, slot id).
"""

from __future__ import annotations

import numpy as np
import jax

from ..config import GrowthConfig
from ..io.writers import dedup_nodes, export_geometry, write_snapshot_csv
from .state import EMPTY, GrowthState


def segments_to_host(st: GrowthState):
    """Alive segments as numpy (starts, ends, sub, state, hypha), in the
    reference's per-hypha traversal order."""
    start, end, sub, state, hypha = jax.device_get(
        (st.start, st.end, st.sub, st.state, st.hypha))
    alive = state != EMPTY
    idx = np.nonzero(alive)[0]
    order = np.lexsort((idx, hypha[idx]))
    idx = idx[order]
    return (np.asarray(start[idx], np.float64),
            np.asarray(end[idx], np.float64),
            np.asarray(sub[idx], np.float64),
            state[idx], hypha[idx])


def export_state_geometry(st: GrowthState, out_dir: str) -> str:
    starts, ends, _, _, _ = segments_to_host(st)
    return export_geometry(out_dir, starts, ends)


def state_mesh(st: GrowthState):
    """(coords, conn) of the deduped network — feed straight into
    fea.build_model without the CSV round-trip."""
    starts, ends, _, _, _ = segments_to_host(st)
    return dedup_nodes(starts, ends)


def write_state_snapshot(st: GrowthState, snapshot_dir: str,
                         step: int) -> str:
    """C++-contract per-step snapshot (x1,y1,x2,y2,intensity with
    intensity = I*L, mycelium_sim_2D.cpp:463-475)."""
    starts, ends, sub, _, _ = segments_to_host(st)
    length = np.linalg.norm(ends - starts, axis=1)
    return write_snapshot_csv(snapshot_dir, step, starts, ends, sub * length)
