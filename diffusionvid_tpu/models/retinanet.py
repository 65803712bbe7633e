"""RetinaNet — single-stage focal-loss detector (parity subtree).

Re-design of the reference RetinaNet
(``mega_core/modeling/rpn/retinanet/retinanet.py``, ``loss.py``,
``inference.py``; defaults ``config/defaults.py:307-362``): ResNet + FPN
P3–P7 (P6/P7 from stride-2 convs on C5, USE_C5=True), a shared 4-conv
classification tower and 4-conv box tower over every level, sigmoid focal
loss (α=0.25, γ=2) over all anchors + smooth-L1 on matched anchors, and
per-level top-k → class-offset NMS at inference.  No shipped VID config
uses it (SURVEY.md §2.2) — it exists for component parity and still runs
end-to-end on synthetic data (tests/test_retinanet.py).

TPU shape discipline: anchors are generated per static feature shape; all
matching/losses are fixed-size mask algebra (no boolean indexing).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.losses import sigmoid_focal_loss, smooth_l1_loss
from ..ops.nms import nms_select
from ..structures.boxes import (
    BoxArray, clip_to_image, decode_boxes, encode_boxes, pairwise_iou,
)
from .fpn import FPN, ConvWB
from .resnet import Conv, ResNet
from .rpn import generate_anchors, shift_anchors


class RetinaNetHead(nn.Module):
    """Shared cls/box towers (retinanet.py RetinaNetHead): NUM_CONVS=4
    3×3 convs + ReLU per tower, then A*K cls logits / A*4 deltas."""

    num_classes: int = 30       # foreground classes (sigmoid, no bg slot)
    num_anchors: int = 9
    num_convs: int = 4
    channels: int = 256
    prior_prob: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence):
        cls_outs, box_outs = [], []
        convs_c = [Conv(self.channels, 3, 1, 1, use_bias=True,
                        dtype=self.dtype, name=f"cls_tower{i}")
                   for i in range(self.num_convs)]
        convs_b = [Conv(self.channels, 3, 1, 1, use_bias=True,
                        dtype=self.dtype, name=f"bbox_tower{i}")
                   for i in range(self.num_convs)]
        bias_init = float(-np.log((1 - self.prior_prob) / self.prior_prob))
        cls_logits = Conv(self.num_anchors * self.num_classes, 3, 1, 1,
                          use_bias=True, dtype=self.dtype, name="cls_logits")
        bbox_pred = Conv(self.num_anchors * 4, 3, 1, 1, use_bias=True,
                         dtype=self.dtype, name="bbox_pred")
        for f in feats:
            c = b = f
            for conv in convs_c:
                c = nn.relu(conv(c))
            for conv in convs_b:
                b = nn.relu(conv(b))
            cls_outs.append(cls_logits(c) + bias_init)
            box_outs.append(bbox_pred(b))
        return cls_outs, box_outs


class RetinaNet(nn.Module):
    """Full meta-architecture; train → loss dict, test → BoxArray batch."""

    depth: int = 50
    num_classes: int = 30
    anchor_sizes: Sequence[int] = (32, 64, 128, 256, 512)
    aspect_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    scales_per_octave: int = 3
    octave: float = 2.0
    fg_iou: float = 0.5
    bg_iou: float = 0.4
    loss_alpha: float = 0.25
    loss_gamma: float = 2.0
    reg_beta: float = 0.11
    reg_weight: float = 4.0
    pre_nms_top_n: int = 1000
    score_thresh: float = 0.05
    nms_thresh: float = 0.4
    detections: int = 100
    pixel_mean: Sequence[float] = (123.675, 116.280, 103.530)
    pixel_std: Sequence[float] = (58.395, 57.120, 57.375)
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNet(depth=self.depth,
                               out_features=("res3", "res4", "res5"),
                               dtype=self.dtype, name="backbone")
        self.fpn = FPN(in_features=("res3", "res4", "res5"), out_channels=256,
                       top_block=False, dtype=self.dtype, name="fpn")
        # LastLevelP6P7 from C5 (USE_C5=True, retinanet.py build)
        self.p6 = Conv(256, 3, 2, 1, use_bias=True, dtype=self.dtype,
                       name="p6")
        self.p7 = Conv(256, 3, 2, 1, use_bias=True, dtype=self.dtype,
                       name="p7")
        self.num_anchors = len(self.aspect_ratios) * self.scales_per_octave
        self.head = RetinaNetHead(num_classes=self.num_classes,
                                  num_anchors=self.num_anchors,
                                  dtype=self.dtype, name="head")

    def features(self, images):
        mean = jnp.asarray(self.pixel_mean)
        std = jnp.asarray(self.pixel_std)
        x = ((images - mean) / std).astype(self.dtype)
        trunk = self.backbone(x)
        pyr = self.fpn(trunk)
        p5 = trunk["res5"]
        p6 = self.p6(p5)
        p7 = self.p7(nn.relu(p6))
        return [pyr["p3"], pyr["p4"], pyr["p5"], p6, p7]

    def _anchors(self, feat_shapes):
        """All-level anchors, concatenated [N,4] (anchor_generator.py with
        octave scales: size * 2^(i/3) for i in 0..2)."""
        all_anchors = []
        for (h, w), size, stride in zip(feat_shapes, self.anchor_sizes,
                                        self.strides):
            sizes = tuple(size * self.octave ** (i / self.scales_per_octave)
                          for i in range(self.scales_per_octave))
            base = generate_anchors(sizes, self.aspect_ratios, stride)
            all_anchors.append(shift_anchors(base, h, w, stride))
        return jnp.asarray(np.concatenate(all_anchors, axis=0))

    def _flatten(self, cls_outs, box_outs):
        b = cls_outs[0].shape[0]
        k = self.num_classes
        cls = jnp.concatenate(
            [c.reshape(b, -1, k) for c in cls_outs], axis=1)
        box = jnp.concatenate(
            [d.reshape(b, -1, 4) for d in box_outs], axis=1)
        return cls, box

    def __call__(self, images, image_hw, gt_boxes=None, gt_labels=None,
                 gt_valid=None, train: bool = False):
        feats = self.features(images)
        cls_outs, box_outs = self.head(feats)
        anchors = self._anchors([f.shape[1:3] for f in feats])
        cls, box = self._flatten(cls_outs, box_outs)

        if train:
            return self.losses(cls, box, anchors, gt_boxes, gt_labels,
                               gt_valid)
        return self.postprocess(cls, box, anchors, image_hw)

    def losses(self, cls, box, anchors, gt_boxes, gt_labels, gt_valid):
        """Focal CE over all non-ignored anchors + smooth-L1 on positives
        (retinanet/loss.py; FG 0.5 / BG 0.4 with an ignore band)."""
        def per_image(logits, deltas, gt_b, gt_l, gt_v):
            iou = pairwise_iou(anchors, gt_b, plus_one=True)
            iou = jnp.where(gt_v[None, :], iou, -1.0)
            best_gt = jnp.argmax(iou, axis=1)
            best_iou = jnp.max(iou, axis=1)
            pos = best_iou >= self.fg_iou
            ignore = (best_iou >= self.bg_iou) & ~pos

            tgt_cls = jnp.where(pos, gt_l[best_gt], 0)       # 1..K or 0
            onehot = jax.nn.one_hot(tgt_cls - 1, self.num_classes) \
                * pos[:, None]
            fl = sigmoid_focal_loss(logits.astype(jnp.float32), onehot,
                                    alpha=self.loss_alpha,
                                    gamma=self.loss_gamma)
            fl = jnp.where(ignore[:, None], 0.0, fl)
            n_pos = jnp.maximum(pos.sum(), 1)
            cls_loss = fl.sum() / n_pos

            tgt = encode_boxes(gt_b[best_gt], anchors)
            reg = smooth_l1_loss(deltas.astype(jnp.float32), tgt,
                                 beta=self.reg_beta).sum(-1)
            reg_loss = self.reg_weight * (reg * pos).sum() / n_pos
            return cls_loss, reg_loss

        cls_l, reg_l = jax.vmap(per_image)(cls, box, gt_boxes, gt_labels,
                                           gt_valid)
        return {"loss_retina_cls": cls_l.mean(),
                "loss_retina_reg": reg_l.mean()}

    def postprocess(self, cls, box, anchors, image_hw):
        """Per-image: top pre_nms_top_n anchor×class scores → decode →
        class-offset NMS → top detections (retinanet/inference.py)."""
        k = self.num_classes
        h, w = image_hw

        def per_image(logits, deltas):
            probs = jax.nn.sigmoid(logits.astype(jnp.float32))  # [N,K]
            flat = probs.reshape(-1)
            top = min(self.pre_nms_top_n, flat.shape[0])
            scores, idx = jax.lax.top_k(flat, top)
            a_idx = idx // k
            c_idx = idx % k
            boxes = decode_boxes(deltas.astype(jnp.float32)[a_idx],
                                 anchors[a_idx])
            boxes = clip_to_image(boxes, image_hw, plus_one=True)
            ok = scores > self.score_thresh
            offs = ((c_idx + 1).astype(jnp.float32)[:, None]
                    * (jnp.maximum(jnp.asarray(h, jnp.float32),
                                   jnp.asarray(w, jnp.float32)) + 1.0))
            keep, val = nms_select(boxes + offs, scores, self.detections,
                                   self.nms_thresh, valid=ok, plus_one=True)
            return BoxArray(boxes[keep], scores[keep],
                            (c_idx[keep] + 1).astype(jnp.int32), val)

        return jax.vmap(per_image)(cls, box)
