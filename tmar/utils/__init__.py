from tmar.utils.profiling import StepTimer, trace_profile, model_flops
from tmar.utils.logging import MetricLogger

__all__ = ["StepTimer", "trace_profile", "model_flops", "MetricLogger"]
