from .resnet import ResNet, FrozenBatchNorm, RESNET_FEATURE_CHANNELS, RESNET_FEATURE_STRIDES
from .fpn import FPN
from .heads import DynamicHead, RCNNHead, DynamicConv, MultiheadAttention, sinusoidal_time_embedding
from .criterion import simota_match, criterion_losses, set_criterion, MatchResult
from .swin import SwinTransformer, SWIN_SIZES
from .rcnn import GeneralizedRCNN
from .rpn import RPNHead, generate_anchors, select_proposals, rpn_loss
from .box_head import (
    C4BoxFeatureExtractor, FPN2MLPFeatureExtractor, FastRCNNPredictor,
    fast_rcnn_loss, postprocess_classic,
)
from .flownet import FlowNetS, EmbedNet, warp_features
from .relation import RelationAttention, RelationStack, position_embedding
from .video_archs import DFFArch, FGFAArch, RDNArch, MEGAArch, MegaState
from .dafa import SparseRCNNDAFA, DafaState
from .detectors import build_detection_model
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
    "SwinTransformer", "SWIN_SIZES", "GeneralizedRCNN",
    "RPNHead", "generate_anchors", "select_proposals", "rpn_loss",
    "C4BoxFeatureExtractor", "FPN2MLPFeatureExtractor", "FastRCNNPredictor",
    "fast_rcnn_loss", "postprocess_classic",
    "FlowNetS", "EmbedNet", "warp_features",
    "RelationAttention", "RelationStack", "position_embedding",
    "DFFArch", "FGFAArch", "RDNArch", "MEGAArch", "MegaState",
    "SparseRCNNDAFA", "DafaState", "build_detection_model",
]
