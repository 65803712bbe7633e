"""Fixed-shape masked NMS.

TPU-native replacement for the reference CUDA/C++ NMS kernels
(``mega_core/csrc/cuda/nms.cu``, ``csrc/cpu/nms_cpu.cpp``; wrapper
``mega_core/layers/nms.py``) and detectron2's ``batched_nms`` used by the
DiffusionDet path (``diffusion_det.py:617,793``).

Instead of returning a ragged keep-index list, we return a boolean keep
mask over the fixed-size input — callers combine it with their validity
masks, so everything stays jittable with static shapes.  Greedy semantics
match the reference exactly: boxes processed in descending score order,
a surviving box suppresses later boxes with IoU > threshold.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..structures.boxes import pairwise_iou


def nms_mask(boxes, scores, iou_threshold: float, valid=None,
             plus_one: bool = False):
    """Greedy NMS; returns a bool keep mask aligned with the inputs.

    Args:
      boxes: [N, 4] xyxy.
      scores: [N].
      iou_threshold: suppress IoU strictly greater than this (matches the
        reference kernel's ``iou > thresh`` test).
      valid: optional [N] bool; invalid slots are never kept and never
        suppress anything.
      plus_one: use the +1-pixel (VOC/caffe2) IoU convention of the classic
        path; the DiffusionDet path uses False (torchvision convention).
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)

    neg_inf = jnp.array(-jnp.inf, scores.dtype)
    order = jnp.argsort(jnp.where(valid, scores, neg_inf))[::-1]
    sboxes = boxes[order]
    svalid = valid[order]

    iou = pairwise_iou(sboxes, sboxes, plus_one=plus_one)
    suppress_next = iou > iou_threshold  # [i, j]: i would suppress j

    def body(i, alive):
        keep_i = alive[i]
        kill = keep_i & suppress_next[i] & (jnp.arange(n) > i)
        return alive & ~kill

    alive = jax.lax.fori_loop(0, n, body, svalid)

    keep_sorted = alive
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep


def nms_select(boxes, scores, k: int, iou_threshold: float, valid=None,
               plus_one: bool = False):
    """Greedy NMS returning the top-k surviving indices — O(k·N) time and
    O(N) memory (no N×N IoU matrix), built for the RPN's 6000→300
    selection (reference: rpn/inference.py + csrc NMS).

    Returns (indices [k], keep_valid [k]): slots beyond the number of
    survivors are marked invalid (they repeat the argmax of an empty set).
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    off = 1.0 if plus_one else 0.0

    area = (boxes[:, 2] - boxes[:, 0] + off) * (boxes[:, 3] - boxes[:, 1] + off)
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)

    def body(i, carry):
        alive, idx_out, val_out = carry
        masked = jnp.where(alive, scores, neg_inf)
        j = jnp.argmax(masked)
        ok = masked[j] > neg_inf
        bj = boxes[j]
        lt = jnp.maximum(bj[:2], boxes[:, :2])
        rb = jnp.minimum(bj[2:], boxes[:, 2:])
        wh = jnp.clip(rb - lt + off, 0.0)
        inter = wh[:, 0] * wh[:, 1]
        iou = inter / jnp.maximum(area + area[j] - inter, 1e-12)
        alive = alive & ~(iou > iou_threshold) & (jnp.arange(n) != j)
        idx_out = idx_out.at[i].set(jnp.where(ok, j, 0).astype(jnp.int32))
        val_out = val_out.at[i].set(ok)
        return alive, idx_out, val_out

    alive0 = valid
    idx0 = jnp.zeros((k,), jnp.int32)
    val0 = jnp.zeros((k,), bool)
    _, idx, val = jax.lax.fori_loop(0, k, body, (alive0, idx0, val0))
    return idx, val


def batched_nms_mask(boxes, scores, labels, iou_threshold: float, valid=None,
                     plus_one: bool = False):
    """Class-aware NMS via the coordinate-offset trick (detectron2
    ``batched_nms`` semantics: boxes of different labels never interact)."""
    if valid is None:
        valid = jnp.ones(boxes.shape[:1], bool)
    max_coord = jnp.max(jnp.where(valid[:, None], boxes, 0.0))
    offsets = labels.astype(boxes.dtype)[:, None] * (max_coord + 1.0)
    return nms_mask(boxes + offsets, scores, iou_threshold, valid=valid,
                    plus_one=plus_one)
