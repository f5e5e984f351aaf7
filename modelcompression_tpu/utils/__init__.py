from modelcompression_tpu.utils.logging import MetricsLogger
from modelcompression_tpu.utils.profiling import StepTimer, nan_check, trace

__all__ = ["MetricsLogger", "StepTimer", "nan_check", "trace"]
