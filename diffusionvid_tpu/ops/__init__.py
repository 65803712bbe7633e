from .nms import nms_mask, batched_nms_mask
from .roi_align import roi_align, multilevel_roi_align, multilevel_roi_align_auto, fpn_level_assignment
from .fps import farthest_point_sample, select_farthest_k_greedy, pairwise_l2_distance
from .memory import FeatureMemory, init_memory, update_erase_memory
from .losses import sigmoid_focal_loss, smooth_l1_loss
from .deform import deform_conv2d, roi_pool, deform_psroi_pool
from .nms import nms_select

__all__ = [
    "nms_mask", "batched_nms_mask",
    "roi_align", "multilevel_roi_align", "multilevel_roi_align_auto", "fpn_level_assignment",
    "farthest_point_sample", "select_farthest_k_greedy", "pairwise_l2_distance",
    "FeatureMemory", "init_memory", "update_erase_memory",
    "sigmoid_focal_loss", "smooth_l1_loss",
    "deform_conv2d", "roi_pool", "deform_psroi_pool", "nms_select",
]
