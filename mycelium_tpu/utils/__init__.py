from .cache import enable_compilation_cache
from .profiling import StepTimer, trace

__all__ = ["trace", "StepTimer", "enable_compilation_cache"]
