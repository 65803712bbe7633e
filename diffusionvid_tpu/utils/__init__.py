from .checkpoint import (
    save_checkpoint, load_checkpoint, last_checkpoint, merge_pretrained,
    resolve_weight,
)
from .torch_convert import convert_torch_state_dict, load_torch_checkpoint
from .logging import setup_logger, MetricLogger, SmoothedValue
from .timer import Timer, profile_trace
from .metrics_io import MetricsWriter, check_expected_results

__all__ = [
    "save_checkpoint", "load_checkpoint", "last_checkpoint", "merge_pretrained",
    "resolve_weight",
    "convert_torch_state_dict", "load_torch_checkpoint",
    "setup_logger", "MetricLogger", "SmoothedValue", "Timer", "profile_trace",
    "MetricsWriter", "check_expected_results",
]
