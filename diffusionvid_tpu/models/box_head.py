"""Classic ROI box head (Fast R-CNN style) — static shapes.

Re-design of the reference box head stack
(``mega_core/modeling/roi_heads/box_head/``):

  * C4 feature extractor: 14×14 ROIAlign on res4 + res5 stage + mean pool
    (roi_box_feature_extractors.py ResNet50Conv5ROIFeatureExtractor);
  * FPN 2-FC extractor (FPN2MLPFeatureExtractor);
  * predictors: class scores [K+1] + class-specific box deltas [K+1, 4]
    (roi_box_predictors.py:6-62);
  * ``PostProcessor``: softmax, per-class score threshold + NMS, detection
    cap (box_head/inference.py:12-103) — rebuilt as one fixed-size
    class-offset NMS selection;
  * ``FastRCNNLossComputation``: 0.5-IoU matching, 512@25% balanced
    sampling, CE + smooth-L1 on class-specific deltas
    (box_head/loss.py:20-198).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.losses import smooth_l1_loss
from ..ops.nms import nms_select
from ..ops.roi_align import roi_align
from ..structures.boxes import (
    BoxArray, clip_to_image, decode_boxes, encode_boxes, pairwise_iou,
)
from .heads import Linear
from .resnet import ResNetStage
from .rpn import sample_balanced


class C4BoxFeatureExtractor(nn.Module):
    """ROIAlign(14×14, 1/16) → res5 (stride 2) → mean pool → [B, R, 2048]."""

    depth: int = 101
    dilation: int = 1     # RES5_DILATION (BASE_RCNN_*gpu.yaml sets 2)
    num_groups: int = 1
    width_per_group: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, res4_feat, boxes):
        pooled = roi_align(res4_feat, boxes, spatial_scale=1.0 / 16,
                           output_size=14, sampling_ratio=2)
        b, r = pooled.shape[:2]
        x = pooled.reshape(b * r, 14, 14, pooled.shape[-1])
        x = ResNetStage(depth=self.depth, stage=5, stride=2,
                        dilation=self.dilation,
                        num_groups=self.num_groups,
                        width_per_group=self.width_per_group,
                        dtype=self.dtype, name="head")(x)
        x = x.mean(axis=(1, 2))
        return x.reshape(b, r, -1)


class FPN2MLPFeatureExtractor(nn.Module):
    """ROIAlign 7×7 over FPN + 2 FC (FPN2MLPFeatureExtractor)."""

    mlp_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, spatial_scales, boxes):
        from ..ops.roi_align import multilevel_roi_align
        pooled = multilevel_roi_align(feats, boxes, spatial_scales,
                                      output_size=7, sampling_ratio=2)
        b, r = pooled.shape[:2]
        x = pooled.reshape(b, r, -1)
        x = nn.relu(Linear(self.mlp_dim, dtype=self.dtype, name="fc6")(x))
        x = nn.relu(Linear(self.mlp_dim, dtype=self.dtype, name="fc7")(x))
        return x


class FastRCNNPredictor(nn.Module):
    """cls_score [K+1] + class-specific bbox_pred [(K+1)*4]."""

    num_classes: int = 31  # including background

    @nn.compact
    def __call__(self, x):
        scores = Linear(self.num_classes, name="cls_score")(x)
        deltas = Linear(self.num_classes * 4, name="bbox_pred")(x)
        return scores, deltas


def fast_rcnn_loss(rng, class_logits, box_deltas, proposals, prop_valid,
                   gt_boxes, gt_labels, gt_valid, *, fg_thresh: float = 0.5,
                   bg_thresh: float = 0.5, batch_size: int = 512,
                   pos_fraction: float = 0.25):
    """Per-image sampled CE + smooth-L1 (box_head/loss.py:20-198), vmapped.

    class_logits [B,R,K+1]; box_deltas [B,R,(K+1)*4]; proposals [B,R,4].
    """
    k1 = class_logits.shape[-1]

    def per_image(r, logits, deltas, props, pv, gt_b, gt_l, gt_v):
        iou = pairwise_iou(props, gt_b, plus_one=True)
        iou = jnp.where((gt_v[None, :]) & (pv[:, None]), iou, -1.0)
        best_gt = jnp.argmax(iou, axis=1)
        best_iou = jnp.max(iou, axis=1)
        labels = jnp.where(best_iou >= fg_thresh,
                           gt_l[best_gt], 0)
        labels = jnp.where(pv, labels, -1)          # invalid → ignore
        match_lab = jnp.where(best_iou >= fg_thresh, 1,
                              jnp.where(pv, 0, -1))
        pos_sel, neg_sel = sample_balanced(r, match_lab, batch_size,
                                           pos_fraction)
        sel = pos_sel | neg_sel

        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ce = -jnp.take_along_axis(logp, jnp.clip(labels, 0)[:, None],
                                  axis=1)[:, 0]
        cls_loss = (ce * sel).sum() / jnp.maximum(sel.sum(), 1)

        tgt = encode_boxes(gt_b[best_gt], props)
        d = deltas.reshape(-1, k1, 4)
        d_sel = jnp.take_along_axis(
            d, jnp.clip(labels, 0)[:, None, None].repeat(4, -1), axis=1)[:, 0]
        reg = smooth_l1_loss(d_sel.astype(jnp.float32), tgt, beta=1.0).sum(-1)
        reg_loss = (reg * pos_sel).sum() / jnp.maximum(sel.sum(), 1)
        return cls_loss, reg_loss

    b = class_logits.shape[0]
    rngs = jax.random.split(rng, b)
    cls_l, reg_l = jax.vmap(per_image)(rngs, class_logits, box_deltas,
                                       proposals, prop_valid, gt_boxes,
                                       gt_labels, gt_valid)
    return {"loss_classifier": cls_l.mean(), "loss_box_reg": reg_l.mean()}


def postprocess_classic(class_logits, box_deltas, proposals, prop_valid,
                        image_hw, *, score_thresh: float = 0.05,
                        nms_thresh: float = 0.5, detections: int = 300):
    """Softmax → class-specific decode → per-class NMS → top detections
    (box_head/inference.py:12-103), one image; static output."""
    r, k1 = class_logits.shape
    probs = jax.nn.softmax(class_logits.astype(jnp.float32), axis=-1)
    boxes_k = decode_boxes(box_deltas.astype(jnp.float32), proposals)
    boxes_k = boxes_k.reshape(r, k1, 4)

    # Flatten foreground classes (skip background 0).
    fg = k1 - 1
    cand_boxes = clip_to_image(boxes_k[:, 1:].reshape(-1, 4), image_hw,
                               plus_one=True)
    cand_scores = probs[:, 1:].reshape(-1)
    cand_labels = (jnp.tile(jnp.arange(1, k1)[None], (r, 1))).reshape(-1)
    ok = (cand_scores > score_thresh) & jnp.repeat(prop_valid, fg)

    # class-offset trick so NMS never crosses classes (jnp.maximum: the
    # extents may be traced values — per-video sizes must not force
    # recompiles)
    h, w = image_hw
    offs = (cand_labels.astype(jnp.float32)[:, None]
            * (jnp.maximum(jnp.asarray(h, jnp.float32),
                           jnp.asarray(w, jnp.float32)) + 1.0))
    idx, val = nms_select(cand_boxes + offs, cand_scores, detections,
                          nms_thresh, valid=ok, plus_one=True)
    return BoxArray(cand_boxes[idx], cand_scores[idx],
                    cand_labels[idx].astype(jnp.int32), val)
