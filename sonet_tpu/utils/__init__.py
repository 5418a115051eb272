from .logging import MetricLogger, StepTimer
from .profiling import trace, enable_nan_checks, diagnose_grads

__all__ = ["MetricLogger", "StepTimer", "trace", "enable_nan_checks",
           "diagnose_grads"]
