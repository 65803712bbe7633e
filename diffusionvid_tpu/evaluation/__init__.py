from .vid_eval import (
    evaluate_vid, calc_prec_rec, calc_ap, corloc, load_motion_iou_mat,
    MOTION_RANGES, MOTION_NAMES,
)

__all__ = ["evaluate_vid", "calc_prec_rec", "calc_ap", "corloc",
           "load_motion_iou_mat", "MOTION_RANGES", "MOTION_NAMES"]
