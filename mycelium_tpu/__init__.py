"""mycelium_tpu — a TPU-native rebuild of the mycelium growth + FEA pipeline.

A brand-new JAX/XLA/Pallas framework with the capabilities of the
`mycelium-fea-project` reference (see SURVEY.md): a lattice-free stochastic
model of fungal network growth coupled to a quasi-static tensile FEA pass,
rebuilt TPU-first — fixed-capacity jit-compiled growth state, matrix-free
sparse solves on the MXU/VPU, and `shard_map` data parallelism in place of
PETSc/MPI.
"""

from . import config, scenes
from .config import FeaConfig, GrowthConfig, archive_parity_config

__version__ = "0.1.0"

__all__ = ["config", "scenes", "FeaConfig", "GrowthConfig",
           "archive_parity_config", "__version__"]
