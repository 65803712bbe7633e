from .resnet import ResNet, FrozenBatchNorm, RESNET_FEATURE_CHANNELS, RESNET_FEATURE_STRIDES
from .fpn import FPN
from .heads import DynamicHead, RCNNHead, DynamicConv, MultiheadAttention, sinusoidal_time_embedding
from .criterion import simota_match, criterion_losses, set_criterion, MatchResult
from .diffusion_det import (
    DiffusionDetArch, DiffusionSchedule, make_schedule, cosine_beta_schedule,
    ddim_times, signal_to_boxes, boxes_to_signal, predict_noise_from_start,
    q_sample, prepare_diffusion_targets,
)

__all__ = [
    "ResNet", "FrozenBatchNorm", "FPN", "DynamicHead", "RCNNHead",
    "DynamicConv", "MultiheadAttention", "sinusoidal_time_embedding",
    "simota_match", "criterion_losses", "set_criterion", "MatchResult",
    "DiffusionDetArch", "DiffusionSchedule", "make_schedule",
    "cosine_beta_schedule", "ddim_times", "signal_to_boxes",
    "boxes_to_signal", "predict_noise_from_start", "q_sample",
    "prepare_diffusion_targets",
    "RESNET_FEATURE_CHANNELS", "RESNET_FEATURE_STRIDES",
]
