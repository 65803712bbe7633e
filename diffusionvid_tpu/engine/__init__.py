from .postprocess import postprocess_frame, postprocess_ensemble, select_topk_detections
from .streaming import StreamingDetector, StreamState
from .train import (
    TrainBatch, TrainState, make_optimizer, make_loss_fn, make_train_step,
    warmup_multistep_schedule,
)

__all__ = [
    "postprocess_frame", "postprocess_ensemble", "select_topk_detections",
    "StreamingDetector", "StreamState",
    "TrainBatch", "TrainState", "make_optimizer", "make_loss_fn",
    "make_train_step", "warmup_multistep_schedule",
]
