"""DAFA — Sparse R-CNN with distillation-aware feature aggregation.

Functional re-design of ``mega_core/modeling/detector/sparse_rcnn_dafa.py``
(the AP50-84.5 predecessor of DiffusionVID): a Sparse R-CNN detector
(learned proposal boxes + features, iterative DynamicConv decoder stages —
the same RCNNHead machinery as DiffusionDet but without time conditioning)
whose proposal features additionally attend over:

  * the top-k features of local/global reference frames (box-level
    aggregation, the DAFA paper's core), kept in the same fixed-capacity
    FPS-deduplicated memory as DiffusionVID (sparse_rcnn_dafa.py:190-195
    uses the identical ``update_erase_memory``);

trained with the same simOTA set criterion.  The pixel-level attention
prototype of the reference (update_lm_pixel, unused by shipped headline
configs) is represented by the memory path only.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.memory import FeatureMemory, init_memory, update_erase_memory
from .heads import MultiheadAttention, RCNNHead
from .resnet import ResNet
from .fpn import FPN


class DafaState(NamedTuple):
    mem: FeatureMemory


class SparseRCNNDAFA(nn.Module):
    """Sparse R-CNN + temporal feature aggregation."""

    depth: int = 101
    num_classes: int = 30
    num_proposals: int = 100
    hidden_dim: int = 256
    num_stages: int = 6
    top_k: int = 75
    memory_size: int = 750
    # GLOBAL.RES_STAGE: how many trailing decoder stages aggregate over the
    # temporal memory (DAFA-G sets 2 — the reference's two-stage global
    # attention, roi_box_feature_extractors.py update_lm res_stage==2 path)
    res_stage: int = 1
    fpn_in: Sequence[str] = ("res3", "res4", "res5")
    head_levels: Sequence[str] = ("p3", "p4", "p5")
    pixel_mean: Sequence[float] = (123.675, 116.280, 103.530)
    pixel_std: Sequence[float] = (58.395, 57.120, 57.375)
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNet(depth=self.depth, out_features=self.fpn_in,
                               dtype=self.dtype, name="backbone")
        self.fpn = FPN(in_features=self.fpn_in, out_channels=self.hidden_dim,
                       dtype=self.dtype, name="fpn")
        kw = dict(d_model=self.hidden_dim, num_classes=self.num_classes,
                  use_time=False, dtype=self.dtype)
        self.heads = [RCNNHead(**kw, name=f"head{i}")
                      for i in range(self.num_stages)]
        self.temporal_attn = MultiheadAttention(self.hidden_dim, 8,
                                                dtype=self.dtype,
                                                name="temporal_attn")
        self.init_proposal_boxes = self.param(
            "init_proposal_boxes",
            lambda k, s: jnp.tile(jnp.asarray([0.5, 0.5, 1.0, 1.0]),
                                  (self.num_proposals, 1)),
            (self.num_proposals, 4))
        self.init_proposal_features = self.param(
            "init_proposal_features", nn.initializers.normal(0.02),
            (self.num_proposals, self.hidden_dim))

    @property
    def spatial_scales(self):
        return tuple(1.0 / (2 ** int(l[1:])) for l in self.head_levels)

    def features(self, images):
        mean = jnp.asarray(self.pixel_mean)
        std = jnp.asarray(self.pixel_std)
        pyr = self.fpn(self.backbone(((images - mean) / std).astype(self.dtype)))
        return [pyr[l] for l in self.head_levels]

    def _learned_proposals(self, batch, whwh):
        """Learned initial boxes (cxcywh in [0,1]) + features (Sparse R-CNN
        init_proposal_boxes / init_proposal_features)."""
        pb = self.init_proposal_boxes
        pf = self.init_proposal_features
        cx, cy, w, h = jnp.split(pb, 4, -1)
        boxes = jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
        boxes = boxes * whwh[None, :]
        return (jnp.tile(boxes[None], (batch, 1, 1)),
                jnp.tile(pf[None], (batch, 1, 1)).astype(self.dtype))

    def init_state(self) -> DafaState:
        return DafaState(init_memory(self.memory_size, self.hidden_dim))

    def extract_topk(self, images, whwh):
        """Reference-frame pass → top-k proposal features for the memory."""
        feats = self.features(images)
        b = images.shape[0]
        boxes, pro = self._learned_proposals(b, whwh)
        logits = None
        for head in self.heads:
            logits, pred, pro_out = head(feats, self.spatial_scales, boxes,
                                         pro, None)
            boxes = jax.lax.stop_gradient(pred)
            pro = pro_out
        score = jnp.max(logits, axis=-1)
        _, idx = jax.lax.top_k(score, min(self.top_k, self.num_proposals))
        sel = jnp.take_along_axis(pro, idx[..., None], axis=1)
        return sel.reshape(-1, self.hidden_dim)

    def update_memory(self, state: DafaState, feats) -> DafaState:
        n = jnp.asarray(feats.shape[0], jnp.int32)
        return DafaState(update_erase_memory(state.mem, feats, n))

    def train_loss(self, cur_images, global_images, whwh,
                   gt_boxes, gt_labels, gt_valid,
                   class_weight: float = 2.0, l1_weight: float = 5.0,
                   giou_weight: float = 2.0):
        """DAFA training (sparse_rcnn_dafa.py:247-382 re-designed for the
        Sparse R-CNN formulation): global ref frames fill the temporal
        memory, the current frame runs the decoder stages with memory
        attention, and every stage is deeply supervised by the simOTA set
        criterion on the current frame's GT."""
        from .criterion import set_criterion

        state = None
        if global_images is not None and global_images.shape[0] > 0:
            feats = self.extract_topk(global_images, whwh)
            state = self.update_memory(self.init_state(), feats)
        logits, boxes = self(cur_images, whwh, state=state, train=True)
        whwh_b = jnp.tile(whwh[None], (cur_images.shape[0], 1))
        total, losses = set_criterion(
            logits, boxes, gt_labels, gt_boxes, gt_valid, whwh_b,
            self.num_classes, class_weight=class_weight,
            l1_weight=l1_weight, giou_weight=giou_weight)
        losses["total_loss_stages"] = total
        return losses

    def __call__(self, images, whwh, state: DafaState = None,
                 train: bool = False):
        """Returns stacked per-stage (logits [S,B,N,K], boxes [S,B,N,4])."""
        feats = self.features(images)
        b = images.shape[0]
        boxes, pro = self._learned_proposals(b, whwh)

        inter_logits, inter_boxes = [], []
        first_agg = self.num_stages - max(1, self.res_stage)
        for si, head in enumerate(self.heads):
            if state is not None and si >= first_agg:
                # aggregate over the temporal memory before each of the
                # last RES_STAGE stages (DAFA-G: two aggregation stages)
                mem_mask = jnp.arange(self.memory_size) < state.mem.count
                q = pro.reshape(1, -1, self.hidden_dim)
                kv = state.mem.feats[None].astype(q.dtype)
                att = self.temporal_attn(q, kv, kv, key_mask=mem_mask[None])
                pro = pro + att.reshape(b, -1, self.hidden_dim)
            logits, pred, pro = head(feats, self.spatial_scales, boxes, pro,
                                     None)
            inter_logits.append(logits)
            inter_boxes.append(pred)
            boxes = jax.lax.stop_gradient(pred)
        return (jnp.stack(inter_logits).astype(jnp.float32),
                jnp.stack(inter_boxes).astype(jnp.float32))
