from .state import GrowthState, init_state, state_env_arrays
from .step import growth_step, run_growth, summarize

__all__ = ["GrowthState", "init_state", "state_env_arrays",
           "growth_step", "run_growth", "summarize"]
