"""Detection post-processing (static shapes).

Re-design of ``DiffusionDet.inference`` (``diffusion_det.py:754-839``):
sigmoid scores over class×proposal, top-K selection, per-class NMS, clip —
but emitting a fixed-size ``BoxArray`` with a keep mask instead of ragged
per-image lists.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.nms import batched_nms_mask
from ..structures.boxes import BoxArray, clip_to_image


def select_topk_detections(logits, boxes, num_detections: int):
    """Flattened class×proposal top-K (diffusion_det.py:771-784).

    logits [N, K] raw; boxes [N, 4].  Returns (boxes [D,4], scores [D],
    labels [D] in 1..K) with D = num_detections.
    """
    n, k = logits.shape
    num_detections = min(num_detections, n * k)
    scores = jax.nn.sigmoid(logits).reshape(-1)            # [N*K]
    top_scores, top_idx = jax.lax.top_k(scores, num_detections)
    prop_idx = top_idx // k
    labels = (top_idx % k + 1).astype(jnp.int32)           # logits 0..K-1 → labels 1..K
    return boxes[prop_idx], top_scores, labels


def postprocess_frame(logits, boxes, image_hw, num_detections: int = 300,
                      use_nms: bool = True, nms_thresh: float = 0.5) -> BoxArray:
    """Single-frame post-processing → fixed-size BoxArray."""
    det_boxes, det_scores, det_labels = select_topk_detections(
        logits, boxes, num_detections)
    valid = jnp.ones_like(det_scores, bool)
    if use_nms:
        valid = batched_nms_mask(det_boxes, det_scores, det_labels, nms_thresh)
    det_boxes = clip_to_image(det_boxes, image_hw)
    return BoxArray(det_boxes, det_scores, det_labels, valid)


def postprocess_ensemble(boxes_steps, scores_steps, labels_steps, image_hw,
                         nms_thresh: float = 0.5) -> BoxArray:
    """×N-step ensemble: concat per-step top-300 selections then one
    class-aware NMS (diffusion_det.py:598-627)."""
    boxes = jnp.concatenate(boxes_steps, axis=0)
    scores = jnp.concatenate(scores_steps, axis=0)
    labels = jnp.concatenate(labels_steps, axis=0)
    valid = batched_nms_mask(boxes, scores, labels, nms_thresh)
    return BoxArray(clip_to_image(boxes, image_hw), scores, labels, valid)
