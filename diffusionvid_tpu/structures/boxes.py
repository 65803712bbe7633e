"""Box structures and pure-jnp box ops.

TPU-native replacement for the reference's ``BoxList``
(``mega_core/structures/bounding_box.py:9``) and ``boxlist_ops``
(``mega_core/structures/boxlist_ops.py``).  Instead of a ragged Python
object we carry fixed-size arrays plus a validity mask, so every op is
jittable with static shapes:

    BoxArray(boxes[N, 4] xyxy, scores[N], labels[N], valid[N])

All ops are dtype-preserving pure functions over jnp arrays.
"""

from __future__ import annotations

from typing import NamedTuple

import math

import jax.numpy as jnp


class BoxArray(NamedTuple):
    """Fixed-size padded detection set. Invalid slots hold zeros."""

    boxes: jnp.ndarray   # [N, 4] xyxy absolute
    scores: jnp.ndarray  # [N]
    labels: jnp.ndarray  # [N] int32 (1..num_classes; 0 = background/pad)
    valid: jnp.ndarray   # [N] bool

    @property
    def num_valid(self):
        return jnp.sum(self.valid.astype(jnp.int32))


def make_box_array(boxes, scores=None, labels=None, valid=None) -> BoxArray:
    n = boxes.shape[0]
    if scores is None:
        scores = jnp.zeros((n,), boxes.dtype)
    if labels is None:
        labels = jnp.zeros((n,), jnp.int32)
    if valid is None:
        valid = jnp.ones((n,), bool)
    return BoxArray(boxes, scores, labels, valid)


# --------------------------------------------------------------------------
# Coordinate conversions (reference: box_cxcywh_to_xyxy / box_xyxy_to_cxcywh,
# mega_core/modeling/roi_heads/box_head/loss.py)
# --------------------------------------------------------------------------

def cxcywh_to_xyxy(b):
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1)


def xyxy_to_cxcywh(b):
    x1, y1, x2, y2 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], axis=-1)


# --------------------------------------------------------------------------
# Areas / IoU.  The reference keeps maskrcnn-benchmark's "+1 pixel" (VOC)
# convention in BoxList.area()/boxlist_iou (boxlist_ops.py:53-90) for the
# classic path and eval, while the DiffusionDet path uses the exclusive
# convention (torchvision ops.box_iou).  Both are provided.
# --------------------------------------------------------------------------

def box_area(boxes, plus_one: bool = False):
    off = 1.0 if plus_one else 0.0
    w = boxes[..., 2] - boxes[..., 0] + off
    h = boxes[..., 3] - boxes[..., 1] + off
    return w * h


def pairwise_intersection(boxes1, boxes2, plus_one: bool = False):
    """[N, M] intersection areas."""
    off = 1.0 if plus_one else 0.0
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt + off, 0.0)
    return wh[..., 0] * wh[..., 1]


def pairwise_iou(boxes1, boxes2, plus_one: bool = False, eps: float = 0.0):
    inter = pairwise_intersection(boxes1, boxes2, plus_one)
    a1 = box_area(boxes1, plus_one)
    a2 = box_area(boxes2, plus_one)
    union = a1[:, None] + a2[None, :] - inter
    return inter / jnp.maximum(union, jnp.finfo(inter.dtype).tiny + eps)


def pairwise_giou(boxes1, boxes2):
    """Generalized IoU [N, M] (reference: generalized_box_iou, loss.py:231-254)."""
    iou = pairwise_iou(boxes1, boxes2)
    inter = pairwise_intersection(boxes1, boxes2)
    a1 = box_area(boxes1)
    a2 = box_area(boxes2)
    union = a1[:, None] + a2[None, :] - inter
    lt = jnp.minimum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.maximum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    hull = wh[..., 0] * wh[..., 1]
    return iou - (hull - union) / jnp.maximum(hull, jnp.finfo(iou.dtype).tiny)


def elementwise_giou(boxes1, boxes2):
    """GIoU along the leading axis, boxes1[i] vs boxes2[i]."""
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    a1 = box_area(boxes1)
    a2 = box_area(boxes2)
    union = a1 + a2 - inter
    iou = inter / jnp.maximum(union, jnp.finfo(inter.dtype).tiny)
    lt_h = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb_h = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh_h = jnp.clip(rb_h - lt_h, 0.0)
    hull = wh_h[..., 0] * wh_h[..., 1]
    return iou - (hull - union) / jnp.maximum(hull, jnp.finfo(iou.dtype).tiny)


def clip_to_image(boxes, image_size_hw, plus_one: bool = False):
    """Clamp xyxy boxes to the image (reference BoxList.clip_to_image,
    bounding_box.py:215-223, TO_REMOVE=1 convention optional)."""
    h, w = image_size_hw
    off = 1.0 if plus_one else 0.0
    x1 = jnp.clip(boxes[..., 0], 0.0, w - off)
    y1 = jnp.clip(boxes[..., 1], 0.0, h - off)
    x2 = jnp.clip(boxes[..., 2], 0.0, w - off)
    y2 = jnp.clip(boxes[..., 3], 0.0, h - off)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


# --------------------------------------------------------------------------
# Box delta coding.
#   * BoxCoder(10,10,5,5): classic RPN/ROI path
#     (mega_core/modeling/box_coder.py, golden-tested by tests/test_box_coder.py)
#   * apply_deltas(2,2,1,1): DiffusionDet RCNNHead
#     (box_head.py:550-590, detectron2 Box2BoxTransform semantics)
# --------------------------------------------------------------------------

_DEFAULT_SCALE_CLAMP = math.log(1000.0 / 16)


def encode_boxes(reference_boxes, proposals, weights=(10.0, 10.0, 5.0, 5.0),
                 plus_one: bool = True):
    """Encode reference boxes relative to proposals (maskrcnn BoxCoder.encode)."""
    off = 1.0 if plus_one else 0.0
    wx, wy, ww, wh = weights
    ex_w = proposals[..., 2] - proposals[..., 0] + off
    ex_h = proposals[..., 3] - proposals[..., 1] + off
    ex_cx = proposals[..., 0] + 0.5 * ex_w
    ex_cy = proposals[..., 1] + 0.5 * ex_h

    gt_w = reference_boxes[..., 2] - reference_boxes[..., 0] + off
    gt_h = reference_boxes[..., 3] - reference_boxes[..., 1] + off
    gt_cx = reference_boxes[..., 0] + 0.5 * gt_w
    gt_cy = reference_boxes[..., 1] + 0.5 * gt_h

    dx = wx * (gt_cx - ex_cx) / ex_w
    dy = wy * (gt_cy - ex_cy) / ex_h
    dw = ww * jnp.log(gt_w / ex_w)
    dh = wh * jnp.log(gt_h / ex_h)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def decode_boxes(deltas, boxes, weights=(10.0, 10.0, 5.0, 5.0),
                 scale_clamp: float = float(_DEFAULT_SCALE_CLAMP),
                 plus_one: bool = True):
    """Decode deltas against anchor boxes (maskrcnn BoxCoder.decode).

    ``deltas``: [..., k*4]; ``boxes``: [..., 4]. ``plus_one`` selects the
    maskrcnn +1 width convention (classic path); DiffusionDet's
    ``apply_deltas`` uses plus_one=False.
    """
    off = 1.0 if plus_one else 0.0
    wx, wy, ww, wh = weights
    widths = boxes[..., 2] - boxes[..., 0] + off
    heights = boxes[..., 3] - boxes[..., 1] + off
    ctr_x = boxes[..., 0] + 0.5 * widths
    ctr_y = boxes[..., 1] + 0.5 * heights

    dx = deltas[..., 0::4] / wx
    dy = deltas[..., 1::4] / wy
    dw = jnp.minimum(deltas[..., 2::4] / ww, scale_clamp)
    dh = jnp.minimum(deltas[..., 3::4] / wh, scale_clamp)

    pred_cx = dx * widths[..., None] + ctr_x[..., None]
    pred_cy = dy * heights[..., None] + ctr_y[..., None]
    pred_w = jnp.exp(dw) * widths[..., None]
    pred_h = jnp.exp(dh) * heights[..., None]

    # Classic maskrcnn path subtracts TO_REMOVE=1 from the far corner;
    # DiffusionDet (plus_one=False) does not.
    x1 = pred_cx - 0.5 * pred_w
    y1 = pred_cy - 0.5 * pred_h
    x2 = pred_cx + 0.5 * pred_w - off
    y2 = pred_cy + 0.5 * pred_h - off
    out = jnp.stack([x1, y1, x2, y2], axis=-1)  # [..., k, 4]
    return out.reshape(*deltas.shape[:-1], -1)


def apply_deltas_diffusion(deltas, boxes, weights=(2.0, 2.0, 1.0, 1.0)):
    """DiffusionDet RCNNHead.apply_deltas (box_head.py:550-590)."""
    return decode_boxes(deltas, boxes, weights=weights, plus_one=False)
