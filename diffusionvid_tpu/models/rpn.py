"""Region Proposal Network — static-shape, single-level (C4) and FPN-ready.

Re-design of the reference RPN stack (``mega_core/modeling/rpn/``):

  * anchor generation (rpn/anchor_generator.py; sizes 64-512 × ratios
    0.5/1/2 at stride 16, configs/BASE_RCNN_1gpu.yaml:5);
  * ``SingleConvRPNHead`` — shared 3×3 conv + 1×1 objectness/deltas
    (rpn/rpn.py:69-106);
  * proposal selection: top-pre_nms objectness → decode → clip → small-box
    filter → NMS → post_nms proposals (rpn/inference.py), as fixed-k
    masked selection (ops.nms_select — no ragged shapes);
  * training targets: IoU 0.7/0.3 matching with low-quality-match recovery
    + balanced 256-sample 50% positive (rpn/loss.py, matcher.py,
    balanced_positive_negative_sampler.py) via masked random top-k;
  * the ``version="ref"`` path emitting REF_POST_NMS_TOP_N=75 reference-
    frame proposals for the MEGA family (rpn/rpn.py:200-243,
    defaults.py:427) is the same selector with a different k.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.losses import smooth_l1_loss
from ..ops.nms import nms_select
from ..structures.boxes import decode_boxes, encode_boxes, pairwise_iou
from .resnet import Conv


def generate_anchors(sizes=(64, 128, 256, 512), ratios=(0.5, 1.0, 2.0),
                     stride: int = 16) -> np.ndarray:
    """[A, 4] base anchors centered on (stride-1)/2 (caffe2 convention,
    rpn/anchor_generator.py generate_anchors)."""
    base = np.array([0, 0, stride - 1, stride - 1], np.float64)
    w = base[2] - base[0] + 1
    h = base[3] - base[1] + 1
    cx = base[0] + 0.5 * (w - 1)
    cy = base[1] + 0.5 * (h - 1)

    out = []
    for r in ratios:
        size = w * h
        ws = np.round(np.sqrt(size / r))
        hs = np.round(ws * r)
        for s in sizes:
            scale = s / stride
            w_s, h_s = ws * scale, hs * scale
            out.append([cx - 0.5 * (w_s - 1), cy - 0.5 * (h_s - 1),
                        cx + 0.5 * (w_s - 1), cy + 0.5 * (h_s - 1)])
    return np.asarray(out, np.float32)


def shift_anchors(base: np.ndarray, feat_h: int, feat_w: int,
                  stride: int) -> np.ndarray:
    """[H*W*A, 4] grid anchors."""
    sx = np.arange(feat_w) * stride
    sy = np.arange(feat_h) * stride
    xx, yy = np.meshgrid(sx, sy)
    shifts = np.stack([xx.ravel(), yy.ravel(), xx.ravel(), yy.ravel()], 1)
    all_a = shifts[:, None, :] + base[None, :, :]
    return all_a.reshape(-1, 4).astype(np.float32)


class RPNHead(nn.Module):
    """3×3 conv + objectness/deltas 1×1 heads (rpn/rpn.py:69-106)."""

    num_anchors: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat):
        t = nn.relu(Conv(feat.shape[-1], 3, 1, 1, use_bias=True,
                         dtype=self.dtype, name="conv")(feat))
        logits = Conv(self.num_anchors, 1, use_bias=True, dtype=self.dtype,
                      name="cls_logits")(t)
        deltas = Conv(self.num_anchors * 4, 1, use_bias=True, dtype=self.dtype,
                      name="bbox_pred")(t)
        return logits, deltas


class Proposals(NamedTuple):
    boxes: jnp.ndarray   # [B, K, 4]
    scores: jnp.ndarray  # [B, K]
    valid: jnp.ndarray   # [B, K]


def select_proposals(logits, deltas, anchors, image_hw, *, pre_nms: int,
                     post_nms: int, nms_thresh: float = 0.7,
                     min_size: float = 0.0):
    """Per-image proposal selection with static shapes.

    logits [B,H,W,A]; deltas [B,H,W,4A]; anchors [H*W*A, 4].
    """
    b = logits.shape[0]
    n = anchors.shape[0]
    obj = logits.reshape(b, -1, logits.shape[-1]).reshape(b, n)
    dl = deltas.reshape(b, -1, 4)

    pre = min(pre_nms, n)

    def per_image(o, d):
        top_o, top_i = jax.lax.top_k(o, pre)
        boxes = decode_boxes(d[top_i], anchors[top_i]).reshape(pre, 4)
        h, w = image_hw
        boxes = jnp.stack([
            jnp.clip(boxes[:, 0], 0, w - 1), jnp.clip(boxes[:, 1], 0, h - 1),
            jnp.clip(boxes[:, 2], 0, w - 1), jnp.clip(boxes[:, 3], 0, h - 1)],
            axis=1)
        ws = boxes[:, 2] - boxes[:, 0] + 1
        hs = boxes[:, 3] - boxes[:, 1] + 1
        ok = (ws >= min_size) & (hs >= min_size)
        idx, val = nms_select(boxes, jnp.where(ok, top_o, -jnp.inf), post_nms,
                              nms_thresh, valid=ok, plus_one=True)
        return boxes[idx], top_o[idx], val

    boxes, scores, valid = jax.vmap(per_image)(obj.astype(jnp.float32),
                                               dl.astype(jnp.float32))
    return Proposals(boxes, scores, valid)


def match_anchors(anchors, gt_boxes, gt_valid, fg_thresh: float = 0.7,
                  bg_thresh: float = 0.3):
    """Anchor→GT matching with low-quality recovery (matcher.py semantics).

    Returns (matched_idx [N], labels [N] ∈ {-1 ignore, 0 bg, 1 fg})."""
    iou = pairwise_iou(anchors, gt_boxes, plus_one=True)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)

    labels = jnp.where(best_iou >= fg_thresh, 1,
                       jnp.where(best_iou < bg_thresh, 0, -1))

    # low-quality matches: anchors that are some GT's best match become fg
    gt_best = jnp.max(iou, axis=0)                       # [G]
    is_best = (iou == gt_best[None, :]) & gt_valid[None, :] & (iou > 0)
    labels = jnp.where(jnp.any(is_best, axis=1), 1, labels)
    return best_gt, labels


def sample_balanced(rng, labels, batch_size: int = 256, pos_fraction: float = 0.5):
    """Masked random balanced sampling (balanced_positive_negative_sampler.py).
    Returns bool masks (pos_sel [N], neg_sel [N])."""
    n = labels.shape[0]
    num_pos_target = int(batch_size * pos_fraction)
    r1, r2 = jax.random.split(rng)

    pos = labels == 1
    neg = labels == 0
    key_pos = jnp.where(pos, jax.random.uniform(r1, (n,)), -1.0)
    key_neg = jnp.where(neg, jax.random.uniform(r2, (n,)), -1.0)

    n_pos = jnp.minimum(pos.sum(), num_pos_target)
    n_neg = jnp.minimum(neg.sum(), batch_size - n_pos)

    # threshold trick: the k-th largest random key defines selection
    pos_sorted = jnp.sort(key_pos)[::-1]
    neg_sorted = jnp.sort(key_neg)[::-1]
    pos_thr = pos_sorted[jnp.clip(n_pos - 1, 0, n - 1)]
    neg_thr = neg_sorted[jnp.clip(n_neg - 1, 0, n - 1)]
    pos_sel = pos & (key_pos >= pos_thr) & (n_pos > 0)
    neg_sel = neg & (key_neg >= neg_thr) & (n_neg > 0)
    return pos_sel, neg_sel


def rpn_loss(rng, logits, deltas, anchors, gt_boxes, gt_valid,
             batch_size: int = 256, pos_fraction: float = 0.5):
    """Per-image objectness BCE + smooth-L1 on sampled anchors
    (rpn/loss.py semantics).  Batched over images via vmap."""

    def per_image(r, o, d, gt_b, gt_v):
        o = o.reshape(-1)
        d = d.reshape(-1, 4)
        matched, labels = match_anchors(anchors, gt_b, gt_v)
        pos_sel, neg_sel = sample_balanced(r, labels, batch_size, pos_fraction)
        sel = pos_sel | neg_sel

        tgt = jnp.clip(labels, 0).astype(jnp.float32)
        bce = (jnp.maximum(o, 0) - o * tgt + jnp.log1p(jnp.exp(-jnp.abs(o))))
        cls_loss = (bce * sel).sum() / jnp.maximum(sel.sum(), 1)

        reg_t = encode_boxes(gt_b[matched], anchors)
        reg = smooth_l1_loss(d, reg_t, beta=1.0 / 9).sum(-1)
        reg_loss = (reg * pos_sel).sum() / jnp.maximum(sel.sum(), 1)
        return cls_loss, reg_loss

    b = logits.shape[0]
    rngs = jax.random.split(rng, b)
    cls_l, reg_l = jax.vmap(per_image)(
        rngs,
        logits.reshape(b, -1).astype(jnp.float32),
        deltas.reshape(b, -1, 4).astype(jnp.float32),
        gt_boxes, gt_valid)
    return {"loss_objectness": cls_l.mean(), "loss_rpn_box_reg": reg_l.mean()}
