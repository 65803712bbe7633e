from .masks import PolygonMasks, Keypoints, PERSON_KEYPOINTS
from .boxes import (
    BoxArray,
    make_box_array,
    cxcywh_to_xyxy,
    xyxy_to_cxcywh,
    box_area,
    pairwise_iou,
    pairwise_giou,
    elementwise_giou,
    clip_to_image,
    encode_boxes,
    decode_boxes,
    apply_deltas_diffusion,
)

__all__ = [
    "BoxArray", "make_box_array", "cxcywh_to_xyxy", "xyxy_to_cxcywh",
    "box_area", "pairwise_iou", "pairwise_giou", "elementwise_giou",
    "clip_to_image", "encode_boxes", "decode_boxes", "apply_deltas_diffusion",
    "PolygonMasks", "Keypoints", "PERSON_KEYPOINTS",
]
