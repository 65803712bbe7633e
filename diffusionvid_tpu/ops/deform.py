"""Deformable convolution v1/v2 and deformable PSRoI pooling — parity ops.

Replaces the reference CUDA kernels (``mega_core/csrc/cuda/deform_conv*.cu``
~2,200 LoC, ``deform_pool*.cu`` ~770 LoC; wrappers ``mega_core/layers/dcn/``)
with gather+einsum formulations.  No shipped flagship config enables DCN
(``MODEL.RESNETS.STAGE_WITH_DCN`` defaults all-False, defaults.py:299), so
these are functionality-parity implementations: correct, differentiable via
JAX autodiff, and jittable — not Pallas-tuned hot paths.

Layout NHWC; offsets follow the torchvision/detectron2 channel convention
([2·K·K] as (ky, kx) interleaved pairs per kernel position).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_gather(feat, ys, xs):
    """feat [H,W,C]; ys/xs [...] pixel coords → [..., C], zeros outside."""
    h, w, c = feat.shape
    inside = (ys > -1.0) & (ys < h) & (xs > -1.0) & (xs < w)
    ys = jnp.clip(ys, 0.0, h - 1)
    xs = jnp.clip(xs, 0.0, w - 1)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly, lx = ys - y0, xs - x0

    flat = feat.reshape(-1, c)

    def g(yy, xx):
        idx = (yy.astype(jnp.int32) * w + xx.astype(jnp.int32)).reshape(-1)
        return flat[idx].reshape(*yy.shape, c)

    out = (g(y0, x0) * ((1 - ly) * (1 - lx))[..., None]
           + g(y0, x1) * ((1 - ly) * lx)[..., None]
           + g(y1, x0) * (ly * (1 - lx))[..., None]
           + g(y1, x1) * (ly * lx)[..., None])
    return out * inside[..., None].astype(feat.dtype)


def deform_conv2d(feat, offsets, weight, bias=None, stride: int = 1,
                  padding: int = 1, dilation: int = 1, mask=None):
    """Deformable conv (v2 when ``mask`` is given).

    feat [B,H,W,Cin]; offsets [B,Ho,Wo,2·K·K] (dy,dx pairs);
    weight [Cout,Cin,K,K] (torch layout); mask [B,Ho,Wo,K·K] modulation.
    Returns [B,Ho,Wo,Cout].
    """
    b, h, w, cin = feat.shape
    cout, _, k, _ = weight.shape
    ho = (h + 2 * padding - dilation * (k - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (k - 1) - 1) // stride + 1

    base_y = jnp.arange(ho) * stride - padding
    base_x = jnp.arange(wo) * stride - padding
    ky = jnp.arange(k) * dilation
    # sample grid per output position and kernel tap: [Ho,Wo,K,K]
    gy = base_y[:, None, None, None] + ky[None, None, :, None]
    gx = base_x[None, :, None, None] + ky[None, None, None, :]

    off = offsets.reshape(b, ho, wo, k * k, 2)
    dy = off[..., 0].reshape(b, ho, wo, k, k)
    dx = off[..., 1].reshape(b, ho, wo, k, k)

    ys = gy[None] + dy
    xs = gx[None] + dx

    sampled = jax.vmap(_bilinear_gather)(feat, ys, xs)  # [B,Ho,Wo,K,K,Cin]
    if mask is not None:
        sampled = sampled * mask.reshape(b, ho, wo, k, k, 1).astype(sampled.dtype)

    out = jnp.einsum("bhwklc,ockl->bhwo", sampled, weight.astype(sampled.dtype),
                     preferred_element_type=jnp.float32).astype(feat.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def roi_pool(features, rois, spatial_scale: float, output_size: int = 7):
    """Max-pooling ROIPool (``csrc/cuda/ROIPool_cuda.cu`` semantics):
    quantized bins, max over each bin.  features [B,H,W,C];
    rois [B,R,4] → [B,R,P,P,C].

    Static-shape approximation: each bin is sampled on a fixed 4×4 grid of
    bilinear taps and max-reduced (exact for bins ≤4px, near-exact above —
    the op is exported-but-unused in the reference, layers/__init__.py:14).
    """
    b, h, w, c = features.shape
    r = rois.shape[1]
    p = output_size
    s = 4  # taps per bin edge

    x1 = rois[..., 0] * spatial_scale
    y1 = rois[..., 1] * spatial_scale
    x2 = rois[..., 2] * spatial_scale
    y2 = rois[..., 3] * spatial_scale
    bw = jnp.maximum(x2 - x1, 1.0) / p
    bh = jnp.maximum(y2 - y1, 1.0) / p

    ts = (jnp.arange(p)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s).reshape(-1)
    ys = y1[..., None] + bh[..., None] * ts         # [B,R,p*s]
    xs = x1[..., None] + bw[..., None] * ts

    yy = jnp.broadcast_to(ys[..., :, None], (b, r, p * s, p * s))
    xx = jnp.broadcast_to(xs[..., None, :], (b, r, p * s, p * s))
    sampled = jax.vmap(_bilinear_gather)(features, yy, xx)  # [B,R,ps,ps,C]
    sampled = sampled.reshape(b, r, p, s, p, s, c)
    return sampled.max(axis=(3, 5))


def deform_psroi_pool(features, rois, offsets, spatial_scale: float,
                      output_size: int = 7, sampling: int = 2):
    """Deformable position-sensitive ROI pooling (deform_pool_cuda.cu
    semantics, exported-but-unused): per-bin learned offsets shift the
    sampling grid before averaging."""
    b, h, w, c = features.shape
    r = rois.shape[1]
    p = output_size

    x1 = rois[..., 0] * spatial_scale
    y1 = rois[..., 1] * spatial_scale
    bw = jnp.maximum((rois[..., 2] - rois[..., 0]) * spatial_scale, 0.1) / p
    bh = jnp.maximum((rois[..., 3] - rois[..., 1]) * spatial_scale, 0.1) / p

    off = offsets.reshape(b, r, p, p, 2)
    ts = (jnp.arange(p)[:, None] + (jnp.arange(sampling)[None, :] + 0.5)
          / sampling).reshape(-1)
    ys = (y1[..., None] + bh[..., None] * ts)[:, :, :, None]   # [B,R,p*s,1]
    xs = (x1[..., None] + bw[..., None] * ts)[:, :, None, :]
    yy = jnp.broadcast_to(ys, (b, r, p * sampling, p * sampling))
    xx = jnp.broadcast_to(xs, (b, r, p * sampling, p * sampling))
    # add per-bin offsets (scaled by roi size)
    oy = jnp.repeat(jnp.repeat(off[..., 0], sampling, 2), sampling, 3)
    ox = jnp.repeat(jnp.repeat(off[..., 1], sampling, 2), sampling, 3)
    yy = yy + oy * bh[..., None, None] * p
    xx = xx + ox * bw[..., None, None] * p

    sampled = jax.vmap(_bilinear_gather)(features, yy, xx)
    sampled = sampled.reshape(b, r, p, sampling, p, sampling, c)
    return sampled.mean(axis=(3, 5))
