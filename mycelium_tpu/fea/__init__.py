from .model import FeaModel, build_model
from .ramp import run_ramp, run_ramp_async, run_ramp_scan, RampResult
from .solve import pcg, bicgstab

__all__ = ["FeaModel", "build_model", "run_ramp", "run_ramp_async", "run_ramp_scan",
           "RampResult", "pcg", "bicgstab"]
