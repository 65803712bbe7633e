"""Static-shape simOTA matcher + set criterion.

Re-design of ``HungarianMatcherDynamicK`` and ``SetCriterionDynamicK``
(``mega_core/modeling/roi_heads/box_head/loss.py:257-688``) for XLA:
instead of ragged per-image index lists, the matcher emits a fixed
``[N_proposals]`` assignment vector (+ fg mask) against GT padded to a
static ``[G_max]``, and every loss is a mask-weighted sum.  Semantics:

  * in-box/in-center gating with center_radius 2.5 scaled by box size
    (loss.py:613-642);
  * cost = 5·L1(norm xyxy) + 2·focal-cls + 2·(−GIoU) + 100·(¬center∧box)
    and +10000 outside the fg union (loss.py:594-603);
  * dynamic-k = clamp(int(Σ top-5 IoU), ≥1) per GT (loss.py:649-651);
  * per-GT top-k lowest-cost selection, proposal conflicts resolved to the
    min-cost GT, then unmatched GTs repaired greedily (loss.py:653-688);
  * losses: focal CE over all proposals normalized by matched count,
    L1 on normalized xyxy + GIoU on absolute boxes over matched pairs,
    deep supervision across stages (loss.py:327-505).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.losses import sigmoid_focal_loss
from ..structures.boxes import (
    pairwise_iou, pairwise_giou, elementwise_giou, cxcywh_to_xyxy,
    xyxy_to_cxcywh,
)


class MatchResult(NamedTuple):
    matched_gt: jnp.ndarray  # [N] int32 index of the matched GT (0 if none)
    fg: jnp.ndarray          # [N] bool, proposal is matched


def _in_boxes_info(prop_cxcywh, gt_cxcywh, gt_xyxy, gt_valid,
                   center_radius: float = 2.5):
    """(loss.py:613-642). Returns (fg_union [N], in_box_and_center [N,G])."""
    cx = prop_cxcywh[:, 0:1]
    cy = prop_cxcywh[:, 1:2]

    in_box = ((cx > gt_xyxy[None, :, 0]) & (cx < gt_xyxy[None, :, 2]) &
              (cy > gt_xyxy[None, :, 1]) & (cy < gt_xyxy[None, :, 3]))

    gw = gt_xyxy[:, 2] - gt_xyxy[:, 0]
    gh = gt_xyxy[:, 3] - gt_xyxy[:, 1]
    gcx = gt_cxcywh[:, 0]
    gcy = gt_cxcywh[:, 1]
    in_center = ((cx > (gcx - center_radius * gw)[None]) &
                 (cx < (gcx + center_radius * gw)[None]) &
                 (cy > (gcy - center_radius * gh)[None]) &
                 (cy < (gcy + center_radius * gh)[None]))

    in_box = in_box & gt_valid[None, :]
    in_center = in_center & gt_valid[None, :]
    fg_union = jnp.any(in_box, -1) | jnp.any(in_center, -1)
    return fg_union, in_box & in_center


def simota_match(pred_logits, pred_boxes, gt_labels, gt_boxes_xyxy, gt_valid,
                 image_whwh, ota_k: int = 5, focal_alpha: float = 0.25,
                 focal_gamma: float = 2.0, cost_class: float = 2.0,
                 cost_bbox: float = 5.0, cost_giou: float = 2.0) -> MatchResult:
    """Single-image simOTA. Shapes: logits [N,K], boxes [N,4] abs xyxy,
    gt_labels [G] (1..K), gt_boxes_xyxy [G,4] abs, gt_valid [G], whwh [4]."""
    n, k = pred_logits.shape
    g = gt_labels.shape[0]
    f32 = jnp.float32

    prob = jax.nn.sigmoid(pred_logits.astype(f32))
    boxes = pred_boxes.astype(f32)
    gt_xyxy = gt_boxes_xyxy.astype(f32)
    gt_cxcywh = xyxy_to_cxcywh(gt_xyxy)

    fg_union, in_both = _in_boxes_info(xyxy_to_cxcywh(boxes), gt_cxcywh,
                                       gt_xyxy, gt_valid)

    ious = pairwise_iou(boxes, gt_xyxy)                       # [N,G]

    # Focal-style classification cost gathered at GT labels (loss.py:573-577).
    pos = focal_alpha * ((1 - prob) ** focal_gamma) * (-jnp.log(prob + 1e-8))
    neg = (1 - focal_alpha) * (prob ** focal_gamma) * (-jnp.log(1 - prob + 1e-8))
    cls_ids = jnp.clip(gt_labels - 1, 0, k - 1)               # [G]
    c_class = pos[:, cls_ids] - neg[:, cls_ids]               # [N,G]

    c_bbox = jnp.sum(jnp.abs((boxes / image_whwh)[:, None, :] -
                             (gt_xyxy / image_whwh)[None, :, :]), axis=-1)
    c_giou = -pairwise_giou(boxes, gt_xyxy)

    cost = (cost_bbox * c_bbox + cost_class * c_class + cost_giou * c_giou
            + 100.0 * (~in_both))
    cost = cost + jnp.where(fg_union, 0.0, 10000.0)[:, None]
    # Invalid GT columns can never match.
    big = jnp.asarray(1e15, f32)
    cost = jnp.where(gt_valid[None, :], cost, big)

    # dynamic-k from the top-ota_k IoU sum per GT (loss.py:649-651).
    topk_ious = jax.lax.top_k(ious.T, ota_k)[0]               # [G, ota_k]
    dynamic_k = jnp.maximum(topk_ious.sum(-1).astype(jnp.int32), 1)

    # Per-GT: match the dynamic_k lowest-cost proposals.  rank via argsort².
    order = jnp.argsort(cost, axis=0)                         # [N,G]
    rank = jnp.argsort(order, axis=0)
    match = (rank < dynamic_k[None, :]) & gt_valid[None, :]

    # Conflict resolution: proposals matched to >1 GT keep the min-cost GT.
    n_match = match.sum(-1)
    best_gt = jnp.argmin(cost, axis=-1)                       # [N]
    onehot_best = jax.nn.one_hot(best_gt, g, dtype=bool)
    match = jnp.where((n_match > 1)[:, None], onehot_best & match, match)

    # Repair pass: any valid GT with no proposal grabs its min-cost proposal
    # among proposals not already matched (loss.py:666-678; sequential so two
    # repaired GTs cannot grab the same proposal).
    def repair(gi, m):
        taken = m.sum(-1) > 0
        col = cost[:, gi] + jnp.where(taken, 1e5, 0.0)
        p = jnp.argmin(col)
        need = gt_valid[gi] & ~jnp.any(m[:, gi])
        return m.at[p, gi].set(jnp.where(need, True, m[p, gi]))

    match = jax.lax.fori_loop(0, g, repair, match)

    fg = jnp.any(match, -1)
    matched_gt = jnp.argmax(match, -1).astype(jnp.int32)
    return MatchResult(matched_gt, fg)


def criterion_losses(pred_logits, pred_boxes, gt_labels, gt_boxes_xyxy,
                     gt_valid, image_whwh, num_classes: int,
                     focal_alpha: float = 0.25, focal_gamma: float = 2.0,
                     ota_k: int = 5):
    """Batched per-stage loss dict (unweighted) — loss.py:327-443 semantics.

    All args batched on the leading axis: logits [B,N,K], boxes [B,N,4],
    labels [B,G], gt boxes [B,G,4], valid [B,G], whwh [B,4].
    """
    match = jax.vmap(simota_match, in_axes=(0, 0, 0, 0, 0, 0))(
        pred_logits, pred_boxes, gt_labels, gt_boxes_xyxy, gt_valid,
        image_whwh)

    b, n, k = pred_logits.shape
    f32 = jnp.float32
    num_matched = jnp.maximum(match.fg.sum().astype(f32), 1.0)

    # Classification: focal CE over every proposal; matched proposals carry
    # their GT's one-hot, everything else all-zeros (background).
    lbl = jnp.take_along_axis(gt_labels, match.matched_gt, axis=1)  # [B,N]
    cls_target = jax.nn.one_hot(jnp.clip(lbl - 1, 0, k - 1), k, dtype=f32)
    cls_target = cls_target * match.fg[..., None]
    ce = sigmoid_focal_loss(pred_logits.astype(f32), cls_target,
                            alpha=focal_alpha, gamma=focal_gamma)
    loss_ce = ce.sum() / num_matched

    # Boxes: L1 on normalized xyxy + GIoU on absolute, matched pairs only.
    gt_b = jnp.take_along_axis(gt_boxes_xyxy, match.matched_gt[..., None], axis=1)
    norm = image_whwh[:, None, :]
    l1 = jnp.abs(pred_boxes.astype(f32) / norm - gt_b.astype(f32) / norm).sum(-1)
    loss_bbox = (l1 * match.fg).sum() / num_matched
    giou = elementwise_giou(pred_boxes.astype(f32), gt_b.astype(f32))
    loss_giou = ((1.0 - giou) * match.fg).sum() / num_matched

    return {"loss_ce": loss_ce, "loss_bbox": loss_bbox, "loss_giou": loss_giou}


def set_criterion(all_logits, all_boxes, gt_labels, gt_boxes_xyxy, gt_valid,
                  image_whwh, num_classes: int, class_weight: float = 2.0,
                  l1_weight: float = 5.0, giou_weight: float = 2.0):
    """Deep-supervised total loss over stacked stage outputs
    [S,B,N,K]/[S,B,N,4] (loss.py:465-505 + weight application,
    diffusion_det.py:370-375). Returns (total, dict of per-stage losses)."""
    s = all_logits.shape[0]
    losses = {}
    total = 0.0
    for i in range(s):
        d = criterion_losses(all_logits[i], all_boxes[i], gt_labels,
                             gt_boxes_xyxy, gt_valid, image_whwh, num_classes)
        suffix = "" if i == s - 1 else f"_{i}"
        losses[f"loss_ce{suffix}"] = d["loss_ce"]
        losses[f"loss_bbox{suffix}"] = d["loss_bbox"]
        losses[f"loss_giou{suffix}"] = d["loss_giou"]
        total = total + (class_weight * d["loss_ce"] + l1_weight * d["loss_bbox"]
                         + giou_weight * d["loss_giou"])
    return total, losses
