from .profiling import StepTimer, trace

__all__ = ["trace", "StepTimer"]
