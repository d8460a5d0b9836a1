"""Checkpoint / resume (closing the reference's §5.4 gap).

The reference has no restart capability — a killed SLURM job is re-run from
scratch (SURVEY.md §5.3-5.4); its closest artifacts are per-step snapshot
CSVs that nothing reads back. Here both pipeline stages checkpoint their
full state:

- growth: every GrowthState array + the PRNG key + step counter + remaining
  cuboid nutrient, so a resumed run continues the exact same trajectory;
- FEA ramp: the active-element mask, last displacement field, ramp position
  and accumulated records.

Format is a plain npz (fixed-capacity arrays make the state a flat dict of
ndarrays — no need for orbax's sharded machinery at this scale; the arrays
restore onto whatever backend is active).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..growth.state import GrowthState

_GROWTH_FIELDS = [f for f in GrowthState._fields]


def save_growth_state(path: str, st: GrowthState) -> str:
    from ..utils.dist import is_coordinator
    if not is_coordinator():   # one writer per cluster (utils/dist.py)
        return path
    st = st._replace(grid=None)   # pure cache, rebuilt on resume
    host = {k: np.asarray(v) for k, v in
            zip(GrowthState._fields, jax.device_get(tuple(st)))
            if k != "grid"}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **host)
    return path


def load_growth_state(path: str) -> GrowthState:
    data = np.load(path)
    missing = set(GrowthState._fields) - set(data.files) - {"grid"}
    if missing:
        raise ValueError(f"checkpoint missing fields: {sorted(missing)}")
    vals = {}
    for k in GrowthState._fields:
        if k == "grid":   # cache; state.ensure_grid re-attaches on resume
            continue
        v = data[k]
        if k == "key":
            vals[k] = jnp.asarray(v, dtype=jnp.uint32)
        else:
            vals[k] = jnp.asarray(v)
    return GrowthState(**vals)


def save_ramp_state(path: str, step: int, active, u_prev,
                    records: Optional[dict] = None) -> str:
    from ..utils.dist import is_coordinator
    if not is_coordinator():   # one writer per cluster (utils/dist.py)
        return path
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "step": np.asarray(step),
        "active": np.asarray(active),
        "u_prev": np.asarray(u_prev),
    }
    for k, v in (records or {}).items():
        payload[f"rec_{k}"] = np.asarray(v)
    np.savez_compressed(path, **payload)
    return path


def load_ramp_state(path: str) -> Tuple[int, np.ndarray, np.ndarray, dict]:
    data = np.load(path)
    records = {k[4:]: data[k] for k in data.files if k.startswith("rec_")}
    return (int(data["step"]), data["active"], data["u_prev"], records)
