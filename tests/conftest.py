"""Test harness config.

Tests run on a virtual 8-device CPU mesh (multi-chip sharding is validated
without TPU hardware) with x64 enabled so the f64 parity bar
(displacement L2 < 1e-6 vs the reference solvers) can be checked exactly.
"""

import os

# The image's sitecustomize registers the axon TPU plugin and pins
# jax_platforms to "axon,cpu". Selecting cpu through the CONFIG (not the
# JAX_PLATFORMS env var — with the plugin registered, the env-var path
# silently ignores jax_num_cpu_devices) gives a virtual 8-device CPU mesh.
os.environ.pop("JAX_PLATFORMS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
# persistent compilation cache: the suite is compile-dominated otherwise
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_RESULTS = "/root/reference/results"


def reference_dir(name: str) -> str:
    return os.path.join(REFERENCE_RESULTS, name)


@pytest.fixture
def ref_results():
    if not os.path.isdir(REFERENCE_RESULTS):
        pytest.skip("reference results archive not available")
    return REFERENCE_RESULTS


def load_ref_csv(path: str) -> np.ndarray:
    """Load a reference CSV with a header row as float64 (True/False cells
    are mapped to 1/0)."""
    import pandas as pd
    df = pd.read_csv(path)
    return df.to_numpy(dtype=np.float64)
