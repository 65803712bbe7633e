from .postprocess import postprocess_frame, postprocess_ensemble, select_topk_detections
from .streaming import StreamingDetector, StreamState
from .bbox_aug import hflip_tta, merge_augmented, flip_boxes_back
from .seq_nms import seq_nms_video, seq_nms_class
from .preprocess import (device_resize_pad, device_yuv420_to_rgb_pad,
                         make_device_preprocess, make_yuv_device_preprocess)
from .train import (
    TrainBatch, TrainState, make_optimizer, make_loss_fn, make_train_step,
    warmup_multistep_schedule, warmup_cosine_schedule,
)

__all__ = [
    "postprocess_frame", "postprocess_ensemble", "select_topk_detections",
    "StreamingDetector", "StreamState",
    "hflip_tta", "merge_augmented", "flip_boxes_back",
    "seq_nms_video", "seq_nms_class",
    "TrainBatch", "TrainState", "make_optimizer", "make_loss_fn",
    "make_train_step", "warmup_multistep_schedule", "warmup_cosine_schedule",
]
