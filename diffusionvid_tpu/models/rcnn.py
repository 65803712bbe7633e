"""GeneralizedRCNN — the single-frame C4 two-stage baseline.

Re-design of ``mega_core/modeling/detector/generalized_rcnn.py`` (the
AP50-76.7 single-frame baseline, BASELINE.md): ResNet-C4 trunk → RPN →
C4 box head.  Train returns a loss dict; test returns a fixed-size
``BoxArray`` per image.  The MEGA-family variants (DFF/FGFA/RDN/MEGA)
build on the same pieces in video_archs.py.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .box_head import (
    C4BoxFeatureExtractor, FastRCNNPredictor, fast_rcnn_loss,
    postprocess_classic,
)
from .resnet import ResNet
from .rpn import (
    RPNHead, generate_anchors, rpn_loss, select_proposals, shift_anchors,
)


class GeneralizedRCNN(nn.Module):
    """C4 faster R-CNN (single-frame VID baseline)."""

    depth: int = 101
    num_classes: int = 31        # incl. background
    anchor_sizes: Sequence[int] = (64, 128, 256, 512)
    anchor_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    anchor_stride: int = 16
    pre_nms_train: int = 2000
    post_nms_train: int = 300
    pre_nms_test: int = 2000
    post_nms_test: int = 300
    ref_post_nms: int = 75       # MEGA-family ref-frame proposals
    res5_dilation: int = 1       # MODEL.RESNETS.RES5_DILATION
    num_groups: int = 1          # ResNeXt (X-101 configs)
    width_per_group: int = 64
    pixel_mean: Sequence[float] = (123.675, 116.280, 103.530)
    pixel_std: Sequence[float] = (58.395, 57.120, 57.375)
    mask_on: bool = False        # MODEL.MASK_ON → ROIMaskHead subtree
    keypoint_on: bool = False    # MODEL.KEYPOINT_ON → ROIKeypointHead
    num_keypoints: int = 17
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNet(depth=self.depth, out_features=("res4",),
                               num_groups=self.num_groups,
                               width_per_group=self.width_per_group,
                               dtype=self.dtype, name="backbone")
        self.num_anchors = len(self.anchor_sizes) * len(self.anchor_ratios)
        self.rpn_head = RPNHead(self.num_anchors, dtype=self.dtype, name="rpn")
        self.box_extractor = C4BoxFeatureExtractor(depth=self.depth,
                                                   dilation=self.res5_dilation,
                                                   num_groups=self.num_groups,
                                                   width_per_group=self.width_per_group,
                                                   dtype=self.dtype,
                                                   name="roi_head")
        self.predictor = FastRCNNPredictor(self.num_classes, name="predictor")
        if self.mask_on:
            from .mask_keypoint import MaskHead
            self.mask_head = MaskHead(num_classes=self.num_classes,
                                      dtype=self.dtype, name="mask_head")
        if self.keypoint_on:
            from .mask_keypoint import KeypointHead
            self.kp_head = KeypointHead(num_keypoints=self.num_keypoints,
                                        dtype=self.dtype, name="kp_head")

    def _anchors(self, feat_hw):
        base = generate_anchors(self.anchor_sizes, self.anchor_ratios,
                                self.anchor_stride)
        return jnp.asarray(shift_anchors(base, feat_hw[0], feat_hw[1],
                                         self.anchor_stride))

    def normalize(self, images):
        mean = jnp.asarray(self.pixel_mean)
        std = jnp.asarray(self.pixel_std)
        return ((images - mean) / std).astype(self.dtype)

    def features(self, images):
        return self.backbone(self.normalize(images))["res4"]

    def proposals(self, feat, image_hw, train: bool = False,
                  ref: bool = False):
        """RPN forward + selection.  ``ref=True`` emits the 75-proposal
        reference-frame set (rpn/rpn.py:200-243)."""
        logits, deltas = self.rpn_head(feat)
        anchors = self._anchors(feat.shape[1:3])
        post = self.ref_post_nms if ref else (
            self.post_nms_train if train else self.post_nms_test)
        pre = self.pre_nms_train if train else self.pre_nms_test
        props = select_proposals(logits, deltas, anchors, image_hw,
                                 pre_nms=pre, post_nms=post)
        return props, (logits, deltas, anchors)

    def box_features(self, feat, boxes):
        """Pooled per-proposal features (used directly by the MEGA family)."""
        return self.box_extractor(feat, boxes)

    def losses_from_features(self, feat, image_hw, gt_boxes, gt_labels,
                             gt_valid):
        """RPN + box-head losses given trunk features — the shared train
        tail reused by DFF/FGFA whose features are flow-warped/aggregated
        before detection (generalized_rcnn_dff.py:88-115,
        generalized_rcnn_fgfa.py:105-143)."""
        props, (logits, deltas, anchors) = self.proposals(feat, image_hw,
                                                          train=True)
        # proposals are training DATA, not a differentiable path — the
        # reference's RPN inference runs under no_grad (rpn/inference.py);
        # without this, grads flow through the O(k·N) NMS selection loop
        props = jax.tree.map(jax.lax.stop_gradient, props)
        r1, r2 = jax.random.split(self.make_rng("sampler"))
        losses = rpn_loss(r1, logits, deltas, anchors, gt_boxes, gt_valid)
        # append GT boxes to proposals (add_gt_proposals,
        # rpn/inference.py) — static: replace the tail slots
        g = gt_boxes.shape[1]
        boxes = jnp.concatenate([props.boxes[:, :-g], gt_boxes], axis=1)
        valid = jnp.concatenate([props.valid[:, :-g], gt_valid], axis=1)
        x = self.box_features(feat, boxes)
        cls_logits, box_deltas = self.predictor(x)
        losses.update(fast_rcnn_loss(
            r2, cls_logits, box_deltas, boxes, valid,
            gt_boxes, gt_labels, gt_valid))
        return losses

    def __call__(self, images, image_hw, gt_boxes=None, gt_labels=None,
                 gt_valid=None, train: bool = False):
        feat = self.features(images)
        if train:
            return self.losses_from_features(feat, image_hw, gt_boxes,
                                             gt_labels, gt_valid)
        props, _ = self.proposals(feat, image_hw, train=False)
        x = self.box_features(feat, props.boxes)
        cls_logits, box_deltas = self.predictor(x)
        dets = jax.vmap(lambda cl, bd, pb, pv: postprocess_classic(
            cl, bd, pb, pv, image_hw))(cls_logits, box_deltas,
                                       props.boxes, props.valid)
        if not (self.mask_on or self.keypoint_on):
            return dets
        # CombinedROIHeads (roi_heads.py:23-58): mask/keypoint heads run on
        # the DETECTED boxes at test time, pooling from the C4 trunk.
        extra = {"dets": dets}
        if self.mask_on:
            ml = self.mask_head([feat], (1.0 / self.anchor_stride,),
                                dets.boxes)          # [B, D, 2m, 2m, K]
            cls_idx = jnp.broadcast_to(
                dets.labels[:, :, None, None, None], ml.shape[:-1] + (1,))
            extra["masks"] = jax.nn.sigmoid(jnp.take_along_axis(
                ml.astype(jnp.float32), cls_idx, axis=-1)[..., 0])
        if self.keypoint_on:
            extra["keypoints"] = self.kp_head(
                [feat], (1.0 / self.anchor_stride,), dets.boxes)
        return extra
