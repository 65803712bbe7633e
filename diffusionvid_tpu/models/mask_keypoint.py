"""Mask and keypoint ROI heads — parity for the maskrcnn-benchmark subtree
the reference ships but no VID config enables (``MODEL.MASK_ON`` /
``MODEL.KEYPOINT_ON``; reference
``mega_core/modeling/roi_heads/mask_head/{mask_head,
roi_mask_feature_extractors,roi_mask_predictors,inference,loss}.py`` and
``keypoint_head/*``, composed by ``roi_heads.py:1-60`` CombinedROIHeads).

TPU-native shape discipline: a fixed number of proposals per image with a
validity mask (no ragged BoxLists); the pooler is the multilevel
ROIAlign; losses select positives by masking, not indexing.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.roi_align import multilevel_roi_align_auto
from .resnet import Conv, Dtype


class ConvTranspose(nn.Module):
    """2D transposed conv in torch weight layout [in, out, kh, kw]
    (mega_core.layers.ConvTranspose2d)."""

    features: int
    kernel: int
    stride: int
    padding: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel
        w = self.param("weight",
                       nn.initializers.variance_scaling(
                           2.0, "fan_out", "truncated_normal"),
                       (in_ch, self.features, k, k))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        # torch IOHW → lax conv_transpose HWIO
        w_hwio = jnp.transpose(w, (2, 3, 0, 1)).astype(self.dtype)
        pad = self.padding
        y = jax.lax.conv_transpose(
            x.astype(self.dtype), w_hwio, (self.stride, self.stride),
            [(k - 1 - pad, k - 1 - pad)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b.astype(self.dtype)


class MaskHead(nn.Module):
    """MaskRCNNFPNFeatureExtractor + MaskRCNNC4Predictor
    (roi_mask_feature_extractors.py:16-66, roi_mask_predictors.py:10-31):
    pooler 14×14 → 4× conv3x3(256)+ReLU → deconv 2×2 s2 + ReLU →
    1×1 → per-class 28×28 logits."""

    num_classes: int = 81
    conv_layers: Sequence[int] = (256, 256, 256, 256)
    pooler_resolution: int = 14
    sampling_ratio: int = 2
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features, spatial_scales, boxes):
        """features: list of [B, Hl, Wl, C]; boxes [B, R, 4] →
        mask logits [B, R, 2·res, 2·res, num_classes]."""
        b, r = boxes.shape[:2]
        x = multilevel_roi_align_auto(
            features, boxes, spatial_scales,
            output_size=self.pooler_resolution,
            sampling_ratio=self.sampling_ratio)
        p = self.pooler_resolution
        x = x.reshape(b * r, p, p, features[0].shape[-1])
        for i, ch in enumerate(self.conv_layers, 1):
            x = Conv(ch, 3, 1, self.dilation, dilation=self.dilation,
                     dtype=self.dtype, name=f"mask_fcn{i}")(x)
            x = nn.relu(x)
        x = nn.relu(ConvTranspose(self.conv_layers[-1], 2, 2,
                                  dtype=self.dtype, name="conv5_mask")(x))
        x = Conv(self.num_classes, 1, 1, 0, use_bias=True, dtype=self.dtype,
                 name="mask_fcn_logits")(x)
        return x.reshape(b, r, 2 * p, 2 * p, self.num_classes)


class KeypointHead(nn.Module):
    """KeypointRCNNFeatureExtractor + KeypointRCNNPredictor
    (roi_keypoint_feature_extractors.py:11-43,
    roi_keypoint_predictors.py:8-34): pooler 14×14 → 8× conv3x3(512)+ReLU
    → deconv k4 s2 → bilinear ×2 → per-keypoint 56×56 heatmaps."""

    num_keypoints: int = 17
    conv_layers: Sequence[int] = (512,) * 8
    pooler_resolution: int = 14
    sampling_ratio: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features, spatial_scales, boxes):
        b, r = boxes.shape[:2]
        x = multilevel_roi_align_auto(
            features, boxes, spatial_scales,
            output_size=self.pooler_resolution,
            sampling_ratio=self.sampling_ratio)
        p = self.pooler_resolution
        x = x.reshape(b * r, p, p, features[0].shape[-1])
        for i, ch in enumerate(self.conv_layers, 1):
            x = Conv(ch, 3, 1, 1, use_bias=True, dtype=self.dtype,
                     name=f"conv_fcn{i}")(x)
            x = nn.relu(x)
        x = ConvTranspose(self.num_keypoints, 4, 2, padding=1,
                          dtype=self.dtype, name="kps_score_lowres")(x)
        hw = x.shape[1]
        x = jax.image.resize(x.astype(jnp.float32),
                             (x.shape[0], hw * 2, hw * 2, x.shape[-1]),
                             "linear").astype(x.dtype)
        return x.reshape(b, r, hw * 2, hw * 2, self.num_keypoints)


def mask_loss(mask_logits, boxes, labels, valid, gt_masks, gt_boxes,
              gt_labels, gt_valid):
    """Per-positive-proposal BCE on 2res×2res crops
    (mask_head/loss.py:project_masks_on_boxes + binary_cross_entropy).

    mask_logits [B, R, M, M, K]; boxes [B, R, 4]; labels [B, R] (matched GT
    class, 0 = background); valid [B, R]; gt_masks [B, G, Hm, Wm] in IMAGE
    pixel space (bool/float); the proposal→GT match index rides in
    ``labels``' companion ``match`` below — here each proposal's target
    crop is interpolated from its matched GT mask.
    """
    b, r, m = mask_logits.shape[:3]

    def crop(mask_img, box):
        """Bilinear M×M crop of [Hm, Wm] at box (project_masks_on_boxes)."""
        h, w = mask_img.shape
        x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
        xs = x1 + (jnp.arange(m) + 0.5) / m * (x2 - x1)
        ys = y1 + (jnp.arange(m) + 0.5) / m * (y2 - y1)
        xi = jnp.clip(xs, 0, w - 1)
        yi = jnp.clip(ys, 0, h - 1)
        x0 = jnp.clip(jnp.floor(xi).astype(jnp.int32), 0, w - 2)
        y0 = jnp.clip(jnp.floor(yi).astype(jnp.int32), 0, h - 2)
        lx = xi - x0
        ly = yi - y0
        g = mask_img.astype(jnp.float32)
        v = (g[y0][:, x0] * (1 - ly[:, None]) * (1 - lx[None])
             + g[y0 + 1][:, x0] * ly[:, None] * (1 - lx[None])
             + g[y0][:, x0 + 1] * (1 - ly[:, None]) * lx[None]
             + g[y0 + 1][:, x0 + 1] * ly[:, None] * lx[None])
        return v

    # match each proposal to its best-IoU GT (loss.py match_targets)
    def per_image(logits, bx, lab, val, gmask, gbox, gval):
        ix1 = jnp.maximum(bx[:, None, 0], gbox[None, :, 0])
        iy1 = jnp.maximum(bx[:, None, 1], gbox[None, :, 1])
        ix2 = jnp.minimum(bx[:, None, 2], gbox[None, :, 2])
        iy2 = jnp.minimum(bx[:, None, 3], gbox[None, :, 3])
        inter = jnp.clip(ix2 - ix1, 0) * jnp.clip(iy2 - iy1, 0)
        area = ((bx[:, 2] - bx[:, 0]) * (bx[:, 3] - bx[:, 1]))[:, None] + \
            ((gbox[:, 2] - gbox[:, 0]) * (gbox[:, 3] - gbox[:, 1]))[None] - inter
        iou = jnp.where(gval[None], inter / jnp.maximum(area, 1e-9), -1.0)
        match = jnp.argmax(iou, axis=1)                       # [R]
        targets = jax.vmap(lambda mi, bb: crop(gmask[mi], bb))(match, bx)
        cls_logit = jax.vmap(lambda lg, c: lg[..., c])(logits, lab)  # [R,M,M]
        pos = val & (lab > 0)
        bce = jnp.maximum(cls_logit, 0) - cls_logit * targets + \
            jnp.log1p(jnp.exp(-jnp.abs(cls_logit)))
        per = bce.mean(axis=(-2, -1))
        return jnp.sum(per * pos) / jnp.maximum(jnp.sum(pos), 1)

    losses = jax.vmap(per_image)(mask_logits, boxes, labels, valid,
                                 gt_masks, gt_boxes, gt_valid)
    return losses.mean()


def paste_masks(mask_probs: np.ndarray, boxes: np.ndarray, img_h: int,
                img_w: int, thresh: float = 0.5) -> np.ndarray:
    """Host-side Masker (mask_head/inference.py:70-140): resize each R×M×M
    probability map into its box and threshold into a full-image binary
    mask [R, img_h, img_w]."""
    import cv2

    out = np.zeros((len(boxes), img_h, img_w), np.uint8)
    for i, (p, b) in enumerate(zip(mask_probs, boxes)):
        x1, y1 = int(np.floor(b[0])), int(np.floor(b[1]))
        x2, y2 = int(np.ceil(b[2])), int(np.ceil(b[3]))
        w = max(x2 - x1, 1)
        h = max(y2 - y1, 1)
        mm = cv2.resize(p.astype(np.float32), (w, h))
        xa, ya = max(x1, 0), max(y1, 0)
        xb, yb = min(x2, img_w), min(y2, img_h)
        if xb > xa and yb > ya:
            out[i, ya:yb, xa:xb] = (mm[ya - y1: yb - y1,
                                       xa - x1: xb - x1] > thresh)
    return out


def heatmaps_to_keypoints(heatmaps: np.ndarray, boxes: np.ndarray):
    """Host-side keypoint decode (keypoint_head/inference.py
    heatmaps_to_keypoints): argmax per keypoint heatmap mapped back into
    the box.  Returns ([R, K, 3] (x, y, score))."""
    r, hm, _, k = heatmaps.shape
    out = np.zeros((r, k, 3), np.float32)
    for i in range(r):
        x1, y1, x2, y2 = boxes[i]
        w = max(x2 - x1, 1e-3)
        h = max(y2 - y1, 1e-3)
        for j in range(k):
            m = heatmaps[i, :, :, j]
            idx = int(m.argmax())
            yy, xx = divmod(idx, m.shape[1])
            out[i, j, 0] = x1 + (xx + 0.5) / m.shape[1] * w
            out[i, j, 1] = y1 + (yy + 0.5) / m.shape[0] * h
            out[i, j, 2] = m[yy, xx]
    return out


def keypoint_loss(kp_logits, boxes, gt_keypoints, valid):
    """Softmax CE over heatmap positions at visible GT keypoints
    (keypoint_head/loss.py keypoints_to_heat_map + cross_entropy).

    kp_logits [B, R, S, S, K]; gt_keypoints [B, R, K, 3] (x, y, vis) per
    matched proposal; valid [B, R]."""
    b, r, s = kp_logits.shape[:3]
    k = kp_logits.shape[-1]

    def per_image(logits, bx, kps, val):
        x1, y1 = bx[:, 0:1], bx[:, 1:2]
        w = jnp.maximum(bx[:, 2:3] - x1, 1e-3)
        h = jnp.maximum(bx[:, 3:4] - y1, 1e-3)
        px = jnp.clip(((kps[..., 0] - x1) / w * s).astype(jnp.int32), 0, s - 1)
        py = jnp.clip(((kps[..., 1] - y1) / h * s).astype(jnp.int32), 0, s - 1)
        inside = ((kps[..., 0] >= x1) & (kps[..., 0] < x1 + w)
                  & (kps[..., 1] >= y1) & (kps[..., 1] < y1 + h))
        vis = (kps[..., 2] > 0) & inside & val[:, None]       # [R, K]
        flat = logits.reshape(r, s * s, k)
        logp = jax.nn.log_softmax(flat, axis=1)
        tgt = py * s + px                                     # [R, K]
        picked = jnp.take_along_axis(
            logp, tgt[:, None, :], axis=1)[:, 0]              # [R, K]
        return -jnp.sum(picked * vis) / jnp.maximum(jnp.sum(vis), 1)

    return jax.vmap(per_image)(kp_logits, boxes, gt_keypoints, valid).mean()
