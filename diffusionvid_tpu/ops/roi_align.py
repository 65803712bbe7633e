"""ROIAlign(V2) for TPU.

Replaces the reference's CUDA ROIAlign (``mega_core/csrc/cuda/ROIAlign_cuda.cu``,
wrapper ``mega_core/layers/roi_align.py``) and detectron2's ``ROIAlignV2``
pooler used by the DiffusionDet head (``box_head.py:250-271``, pooler type
``configs/vid_R_101_DiffusionVID.yaml:19``).

Design: rather than one kernel launch per FPN level with ragged per-level
ROI sets (the detectron2 ``ROIPooler`` approach), all levels are flattened
into a single [B, ΣHl·Wl, C] buffer and each ROI computes flat gather
indices into its assigned level.  One batched gather per bilinear corner →
static shapes, no level partitioning, XLA fuses the interpolation maths.
Bilinear border semantics match the CUDA kernel exactly (zero outside
[-1, size], clamp into [0, size-1]).  Fully differentiable via JAX autodiff
(the reference needs a hand-written backward kernel, ROIAlign_cuda.cu:200+).

Layout is NHWC throughout (TPU-friendly; channels on the 128-lane axis).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp


def roi_align(features, rois, spatial_scale: float, output_size: int = 7,
              sampling_ratio: int = 2, aligned: bool = True):
    """Single-level ROIAlign.

    Args:
      features: [B, H, W, C].
      rois: [B, R, 4] xyxy in image coordinates.
      spatial_scale: 1/stride of this feature level.
      aligned: True = ROIAlignV2 (pixel-model half-offset).

    Returns [B, R, output_size, output_size, C].
    """
    b, h, w, c = features.shape
    return multilevel_roi_align(
        [features], rois,
        spatial_scales=[spatial_scale],
        output_size=output_size,
        sampling_ratio=sampling_ratio,
        aligned=aligned,
        level_assignment="single",
    )


def fpn_level_assignment(rois, num_levels: int, min_level: int,
                         canonical_box_size: float = 224.0,
                         canonical_level: int = 4):
    """detectron2 ``assign_boxes_to_levels`` (poolers.py): level =
    floor(canonical_level + log2(sqrt(area)/canonical_box_size)), clamped."""
    area = jnp.clip(rois[..., 2] - rois[..., 0], 0) * jnp.clip(rois[..., 3] - rois[..., 1], 0)
    eps = 1e-8
    lvl = jnp.floor(canonical_level + jnp.log2(jnp.sqrt(area) / canonical_box_size + eps))
    lvl = jnp.clip(lvl, min_level, min_level + num_levels - 1)
    return (lvl - min_level).astype(jnp.int32)  # [B, R] in [0, num_levels)


def multilevel_roi_align(features: Sequence, rois, spatial_scales: Sequence[float],
                         output_size: int = 7, sampling_ratio: int = 2,
                         aligned: bool = True, level_assignment: str = "fpn",
                         canonical_box_size: float = 224.0,
                         canonical_level: int = 4):
    """FPN-aware ROIAlign over flattened levels.

    Args:
      features: list of [B, Hl, Wl, C] arrays, finest first.
      rois: [B, R, 4] xyxy image coordinates.
      spatial_scales: per-level 1/stride, e.g. (1/8, 1/16, 1/32).
      level_assignment: "fpn" = canonical-scale assignment; "single" = all
        ROIs on level 0.

    Returns [B, R, output_size, output_size, C].
    """
    assert len(features) == len(spatial_scales)
    b, r = rois.shape[:2]
    c = features[0].shape[-1]
    num_levels = len(features)
    p = output_size
    sr = sampling_ratio
    dtype = features[0].dtype

    # Flatten all levels into one [B, L_total, C] buffer.
    sizes = [(f.shape[1], f.shape[2]) for f in features]
    flat = jnp.concatenate([f.reshape(b, -1, c) for f in features], axis=1)
    offsets = []
    off = 0
    for (hl, wl) in sizes:
        offsets.append(off)
        off += hl * wl

    if level_assignment == "single" or num_levels == 1:
        level = jnp.zeros((b, r), jnp.int32)
    else:
        min_level = int(round(-math.log2(spatial_scales[0])))
        level = fpn_level_assignment(rois, num_levels, min_level,
                                     canonical_box_size, canonical_level)

    # Per-roi level-dependent constants.
    scales = jnp.asarray(spatial_scales, dtype=jnp.float32)[level]          # [B,R]
    lvl_h = jnp.asarray([s[0] for s in sizes], jnp.int32)[level]
    lvl_w = jnp.asarray([s[1] for s in sizes], jnp.int32)[level]
    lvl_off = jnp.asarray(offsets, jnp.int32)[level]

    half = 0.5 if aligned else 0.0
    rois_f = rois.astype(jnp.float32)
    x1 = rois_f[..., 0] * scales - half
    y1 = rois_f[..., 1] * scales - half
    x2 = rois_f[..., 2] * scales - half
    y2 = rois_f[..., 3] * scales - half
    if aligned:
        roi_w = x2 - x1
        roi_h = y2 - y1
    else:
        roi_w = jnp.maximum(x2 - x1, 1.0)
        roi_h = jnp.maximum(y2 - y1, 1.0)

    bin_h = roi_h / p  # [B,R]
    bin_w = roi_w / p

    # Sample grid: [p, sr] fractional positions inside the ROI.
    iy = (jnp.arange(p)[:, None] + (jnp.arange(sr)[None, :] + 0.5) / sr).reshape(-1)  # [p*sr]
    # y coords: [B, R, p*sr]
    ys = y1[..., None] + bin_h[..., None] * iy
    xs = x1[..., None] + bin_w[..., None] * iy

    # Broadcast to [B, R, p*sr(y), p*sr(x)]
    ys_b = ys[..., :, None]
    xs_b = xs[..., None, :]
    hh = lvl_h[..., None, None].astype(jnp.float32)
    ww = lvl_w[..., None, None].astype(jnp.float32)

    # CUDA border rule (ROIAlign_cuda.cu:22): zero iff coord < -1 or > size
    inside = (ys_b >= -1.0) & (ys_b <= hh) & (xs_b >= -1.0) & (xs_b <= ww)
    yc = jnp.clip(ys_b, 0.0, hh - 1.0)
    xc = jnp.clip(xs_b, 0.0, ww - 1.0)

    y_low = jnp.floor(yc)
    x_low = jnp.floor(xc)
    y_high = jnp.minimum(y_low + 1.0, hh - 1.0)
    x_high = jnp.minimum(x_low + 1.0, ww - 1.0)
    ly = yc - y_low
    lx = xc - x_low
    hy = 1.0 - ly
    hx = 1.0 - lx

    wide_w = lvl_w[..., None, None]
    base = lvl_off[..., None, None]
    yl = y_low.astype(jnp.int32)
    yh = y_high.astype(jnp.int32)
    xl = x_low.astype(jnp.int32)
    xh = x_high.astype(jnp.int32)

    def flat_idx(yy, xx):
        return (base + yy * wide_w + xx).reshape(b, -1)  # [B, R*p*sr*p*sr]

    idx = [flat_idx(yl, xl), flat_idx(yl, xh), flat_idx(yh, xl), flat_idx(yh, xh)]
    wts = [hy * hx, hy * lx, ly * hx, ly * lx]

    out = jnp.zeros((b, r * p * sr * p * sr, c), dtype)
    for i4, w4 in zip(idx, wts):
        gathered = jnp.take_along_axis(flat, i4[..., None], axis=1)  # [B, S, C]
        out = out + gathered * w4.reshape(b, -1, 1).astype(dtype)
    out = out * inside.reshape(b, -1, 1).astype(dtype)

    # [B, R, p, sr, p, sr, C] → average over the sr sample axes.
    out = out.reshape(b, r, p, sr, p, sr, c)
    out = out.mean(axis=(3, 5))
    return out  # [B, R, p, p, C]


import functools

import jax


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _pallas_roi_align_diff(features, rois, spatial_scales, output_size,
                           sampling_ratio, flat):
    from .roi_align_pallas import multilevel_roi_align_mxu
    return multilevel_roi_align_mxu(list(features), rois, spatial_scales,
                                    output_size, sampling_ratio,
                                    flat=flat)


def _pra_fwd(features, rois, spatial_scales, output_size, sampling_ratio,
             flat):
    out = _pallas_roi_align_diff(features, rois, spatial_scales, output_size,
                                 sampling_ratio, flat)
    return out, (features, rois)


def _pra_bwd(spatial_scales, output_size, sampling_ratio, flat, res, g):
    """Backward via the banded-transpose Pallas kernel when the forward
    took the flat kernel path (no scatter; full-width row adds —
    default ON since the round-3 real-chip adjudication measured the
    flagship train step at 184.8 vs 238.6 ms/step with the XLA scatter
    transpose; kill switch DIFFUSIONVID_ROI_BWD_KERNEL=0), else the
    gather formulation's VJP.  Box gradients are zero — the reference
    CUDA ROIAlign backward also only produces feature gradients
    (ROIAlign_cuda.cu)."""
    import os

    features, rois = res
    bwd_kernel = os.environ.get("DIFFUSIONVID_ROI_BWD_KERNEL", "1")
    if flat and bwd_kernel not in ("0", "off"):
        from .roi_align_pallas import multilevel_roi_align_bwd_mxu
        shapes = [(f.shape[1], f.shape[2]) for f in features]
        grads = multilevel_roi_align_bwd_mxu(
            g, rois, shapes, spatial_scales, output_size, sampling_ratio,
            out_dtype=features[0].dtype)
        return tuple(grads), jax.numpy.zeros_like(rois)
    if flat:
        # row-major flat cotangent → [B, R, py, px, C] y-major 5D
        b, r, pp, c = g.shape
        p = int(pp ** 0.5)
        g = g.reshape(b, r, p, p, c)
    _, vjp = jax.vjp(
        lambda f: multilevel_roi_align(list(f), rois, spatial_scales,
                                       output_size, sampling_ratio),
        features)
    (df,) = vjp(g)
    return df, jax.numpy.zeros_like(rois)


_pallas_roi_align_diff.defvjp(_pra_fwd, _pra_bwd)


def multilevel_roi_align_auto(features, rois, spatial_scales,
                              output_size: int = 7, sampling_ratio: int = 2,
                              aligned: bool = True, flat: bool = False,
                              **kw):
    """Backend dispatch: the Pallas banded kernel on TPU (3-level FPN) with
    a banded-transpose backward; the XLA gather formulation elsewhere
    (CPU tests, odd configs).  ``flat=True`` returns the pooled grid FLAT
    as [B, R, p·p, C] in **row-major (py, px)** order — the torch
    flatten order (the v4 kernel's native store order), so
    order-sensitive consumers use converted checkpoint weights
    unmodified."""
    if (jax.default_backend() in ("tpu", "axon") and len(features) == 3
            and aligned and rois.shape[1] % 50 == 0):
        return _pallas_roi_align_diff(tuple(features), rois,
                                      tuple(spatial_scales), output_size,
                                      sampling_ratio, flat)
    out = multilevel_roi_align(features, rois, spatial_scales, output_size,
                               sampling_ratio, aligned)
    if flat:
        b, r = out.shape[:2]
        return out.reshape(b, r, output_size * output_size, -1)
    return out
