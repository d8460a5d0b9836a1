from .sweep import run_solver_sweep

__all__ = ["run_solver_sweep"]
