"""Pallas TPU kernel for multi-level ROIAlignV2.

The XLA gather formulation (ops/roi_align.py) runs at ~21 ms per 8-frame
chunk on v5e — random 4-corner row gathers cap at ~2% of HBM bandwidth.
This kernel exploits two structural facts:

  1. With a regular sampling grid, bilinear ROIAlign is *separable*: a
     y-pass interpolates 2 feature rows per sample row, then an x-pass
     interpolates 2 columns per sample column — bands, not gathers.
  2. All FPN levels of one frame fit in VMEM together (p3+p4+p5 at
     608×1024 ≈ 6.5 MB bf16), so every ROI touches VMEM only.

Mosaic-shaped details (each avoids a known lowering cliff):
  * dynamic row slices are only taken on dims *beyond* the (sublane, lane)
    pair — feature maps are sliced on their H dim (dim 1 of the 4D block),
    the scratch on its sample dim (dim 0);
  * the x-pass reads an 8-aligned 16-column window (`pl.multiple_of`) and
    reduces it with a one-hot-built weight vector, since unaligned dynamic
    sublane starts don't lower;
  * all stores are full rows — the 2x2 sampling-grid mean is fused into
    the kernel so the output is the final [7, 7, C] tile (x-major; the
    tiny transpose happens outside in XLA);
  * ROI band indices live in SMEM (scalars for slicing), band weights in
    VMEM (read per-ROI as a [s, 2] vector).

Border semantics match the CUDA kernel exactly — band (index, weight)
pairs are precomputed in jnp with the same clamp + zero-outside-(-1, size)
rules, including the y_high == y_low edge at the last row.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .roi_align import fpn_level_assignment


def _band_params(coords, sizes):
    """Per sample: (lo int32, w_lo, w_hi) with ROIAlign border semantics.
    ``sizes`` broadcasts per ROI.  lo in [0, size-2]; weights absorb the
    clamping (a sample in the last cell puts its whole weight on slot 1)."""
    sz = sizes.astype(jnp.float32)
    # CUDA border rule (ROIAlign_cuda.cu:22): zero iff coord < -1 or > size
    inside = (coords >= -1.0) & (coords <= sz)
    cc = jnp.clip(coords, 0.0, sz - 1.0)
    low = jnp.floor(cc)
    high = jnp.minimum(low + 1.0, sz - 1.0)
    l = cc - low
    w_low = (1.0 - l) * inside
    w_high = jnp.where(high > low, l * inside, 0.0)
    lo = jnp.clip(low, 0.0, jnp.maximum(sz - 2.0, 0.0))
    shifted = low > lo
    w0 = jnp.where(shifted, 0.0, w_low)
    w1 = jnp.where(shifted, w_low, w_high)
    return lo.astype(jnp.int32), w0.astype(jnp.float32), w1.astype(jnp.float32)


def _kernel(level_shapes, f3_ref, f4_ref, f5_ref, lvl_ref, y0_ref, x0_ref,
            wy_ref, wx_ref, o_ref, t_ref, *, rb: int, s: int, p: int,
            sr: int, pad_wl: int):
    """One (frame, ROI-block) tile.

    f{3,4,5}_ref [1, Hl, Wl, C] — VMEM-resident level maps
    lvl_ref [1, R, 1] (SMEM)    — assigned level per ROI
    y0_ref/x0_ref [1, R, s]     — band start indices (SMEM)
    wy_ref/wx_ref [1, R, s, 2]  — band weights (VMEM)
    o_ref [1, RB, p, p, C]      — final pooled tile, x-major [j7, i7]
    t_ref scratch [s, pad_Wl, C]
    """
    block = pl.program_id(1)
    c = t_ref.shape[-1]
    inv = 1.0 / (sr * sr)

    def make_branch(f_ref, wl):
        def branch(i, g):
            wyv = wy_ref[0, g]                      # [s, 2]
            wxv = wx_ref[0, g]

            for k in range(s):                      # y-pass: full-row stores
                lo = y0_ref[0, g, k]
                rows = f_ref[0, pl.ds(lo, 2), :, :]          # [2, Wl, C]
                w0 = wyv[k, 0].astype(rows.dtype)
                w1 = wyv[k, 1].astype(rows.dtype)
                interp = rows[0] * w0 + rows[1] * w1         # [Wl, C]
                t_ref[k] = jnp.pad(interp, ((0, pad_wl - wl), (0, 0)))

            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 32, 1), 1)
            for j7 in range(p):                     # x-pass + fused 2x2 mean
                # both sampling columns of output column j7 come from one
                # 8-aligned 32-wide window (sample spacing ≤ extent/s keeps
                # the second band within the window for any ROI width)
                ja = j7 * sr
                jb = ja + sr - 1
                lo_a = x0_ref[0, g, ja]
                lo_b = x0_ref[0, g, jb]
                lo8 = pl.multiple_of((jnp.minimum(lo_a, lo_b) // 8) * 8, 8)
                win = t_ref[:, pl.ds(lo8, 32), :]            # [s, 32, C]
                w32 = jnp.zeros((1, 32, 1), jnp.float32)
                for u in range(sr):
                    j = j7 * sr + u
                    d = x0_ref[0, g, j] - lo8
                    w32 = (w32 + jnp.where(lane == d, wxv[j, 0], 0.0)
                           + jnp.where(lane == d + 1, wxv[j, 1], 0.0))
                acc = jnp.sum(win.astype(jnp.float32) * w32, axis=1)
                # fold the y sampling pairs with a tiny constant matmul
                # ([p, s] pair-sum matrix — reshape+sum relayouts don't
                # lower in Mosaic)
                ri = jax.lax.broadcasted_iota(jnp.int32, (p, s), 0)
                ci = jax.lax.broadcasted_iota(jnp.int32, (p, s), 1)
                fold = ((ci // sr) == ri).astype(jnp.float32)
                pooled = jax.lax.dot_general(
                    fold, acc, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * inv
                o_ref[0, i, j7] = pooled.astype(o_ref.dtype)

        return branch

    branches = [make_branch(f3_ref, level_shapes[0][1]),
                make_branch(f4_ref, level_shapes[1][1]),
                make_branch(f5_ref, level_shapes[2][1])]

    def roi_loop(i, _):
        g = block * rb + i
        jax.lax.switch(lvl_ref[0, g, 0], branches, i, g)
        return 0

    jax.lax.fori_loop(0, rb, roi_loop, 0)


def _kernel_v2(level_shapes, f3_ref, f4_ref, f5_ref, lvl_ref, y0_ref, x0_ref,
               wy_ref, wx_ref, o_ref, t_ref, *, rb: int, s: int, p: int,
               sr: int, pad_wl: int):
    """Fold-everything variant of ``_kernel``: the 2×2 sampling-grid mean
    is folded into BOTH passes, so the y-pass writes p (=7) pre-averaged
    rows instead of s (=14) sample rows and the x-pass emits final [p, C]
    rows directly — eliminating the per-window fold ``dot_general`` (a
    latency-bound tiny MXU op, 7 per ROI) and halving y stores + scratch.

    Same refs as ``_kernel``; t_ref scratch is [p, pad_Wl, C].
    """
    block = pl.program_id(1)
    inv = 1.0 / (sr * sr)

    def make_branch(f_ref, wl):
        def branch(i, g):
            wyv = wy_ref[0, g]                      # [s, 2] fp32
            wxv = wx_ref[0, g]

            for j in range(p):                      # folded y-pass
                acc = None
                for u in range(sr):                 # sr sample rows per bin
                    k = j * sr + u
                    lo = y0_ref[0, g, k]
                    rows = f_ref[0, pl.ds(lo, 2), :, :]      # [2, Wl, C]
                    w0 = wyv[k, 0].astype(rows.dtype)
                    w1 = wyv[k, 1].astype(rows.dtype)
                    part = rows[0] * w0 + rows[1] * w1       # [Wl, C]
                    acc = part if acc is None else acc + part
                t_ref[j] = jnp.pad(acc, ((0, pad_wl - wl), (0, 0)))

            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 32, 1), 1)
            for j7 in range(p):                     # x-pass, final rows out
                ja = j7 * sr
                jb = ja + sr - 1
                lo_a = x0_ref[0, g, ja]
                lo_b = x0_ref[0, g, jb]
                lo8 = pl.multiple_of((jnp.minimum(lo_a, lo_b) // 8) * 8, 8)
                win = t_ref[:, pl.ds(lo8, 32), :]            # [p, 32, C]
                w32 = jnp.zeros((1, 32, 1), jnp.float32)
                for u in range(sr):
                    jx = j7 * sr + u
                    d = x0_ref[0, g, jx] - lo8
                    w32 = (w32 + jnp.where(lane == d, wxv[jx, 0], 0.0)
                           + jnp.where(lane == d + 1, wxv[jx, 1], 0.0))
                acc = jnp.sum(win.astype(jnp.float32) * (w32 * inv),
                              axis=1)                        # [p, C] fp32
                o_ref[0, i, j7] = acc.astype(o_ref.dtype)

        return branch

    branches = [make_branch(f3_ref, level_shapes[0][1]),
                make_branch(f4_ref, level_shapes[1][1]),
                make_branch(f5_ref, level_shapes[2][1])]

    def roi_loop(i, _):
        g = block * rb + i
        jax.lax.switch(lvl_ref[0, g, 0], branches, i, g)
        return 0

    jax.lax.fori_loop(0, rb, roi_loop, 0)


_WIN = 48  # narrow-window width: covers extent ≤ 38 cells + 8-align slack


def _transpose_perm_matrix(p: int):
    """[p², p²] one-hot permutation P with P[(a·p+b), (b·p+a)] = 1 — swaps
    the two minor grid axes of a flat [p², C] tile via one tiny MXU dot
    (a symmetric involution: the same P maps px-major↔row-major).  Built
    from iotas so it lowers in Mosaic (no host constants)."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (p * p, p * p), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (p * p, p * p), 1)
    src = (ri % p) * p + ri // p
    return (ci == src).astype(jnp.float32)


def _kernel_v4(level_shapes, f3_ref, f4_ref, f5_ref, scal_ref, wy_ref,
               wxm_ref, wx_ref, o_ref, tn_ref, t_ref, st_ref, *, rb: int,
               s: int, p: int, sr: int, pad_wl: int):
    """MXU x-pass variant of ``_kernel_v3``.

    Two changes over v3:

      1. The narrow branch's x-pass is ONE small MXU dot per output row
         instead of p one-hot VPU reductions over the [p, _WIN, C]
         window: the per-ROI x weight matrix ``Wx[p, _WIN]`` (band
         one-hots × 1/sr², folded over the sr sample columns) is
         precomputed in jnp and the kernel computes
         ``out[py] = Wx @ tn[py]`` — [p, _WIN]·[_WIN, C] → [p(px), C].
         The one-hot build (4·sr wheres per column) and the full-window
         multiply-reduce leave the VPU entirely.
      2. The output tile is FLAT [1, RB, p·p, C] in **row-major (py, px)**
         order — the torch ``flatten`` order, so the DynamicConv
         out-projection consumes it with NO weight permutation and
         checkpoint conversion is the identity.  The MXU dot emits
         exactly this order (its rows are px for fixed py).  The wide
         branch stages px-major rows and applies one [p², p²]
         permutation dot (``_transpose_perm_matrix``).

    The y-pass accumulates in fp32 (v3 folded in the feature dtype), so
    v4 is also slightly *more* accurate for bf16 feature maps.
    """
    block = pl.program_id(1)
    inv = 1.0 / (sr * sr)

    def narrow_branch(f_ref):
        def branch(i, g):
            wyv = wy_ref[0, g]
            xs = scal_ref[0, g, 2 * s + 1]

            for j in range(p):                  # windowed, folded y-pass
                acc = None
                for u in range(sr):
                    k = j * sr + u
                    lo = scal_ref[0, g, k]
                    rows = f_ref[0, pl.ds(lo, 2),
                                 pl.ds(pl.multiple_of(xs, 8), _WIN), :]
                    part = (rows[0].astype(jnp.float32) * wyv[k, 0]
                            + rows[1].astype(jnp.float32) * wyv[k, 1])
                    acc = part if acc is None else acc + part
                tn_ref[j] = acc                 # [_WIN, C] fp32

            wm = wxm_ref[0, g]                  # [p, _WIN] fp32 (inv folded)
            for py in range(p):
                acc = jax.lax.dot_general(
                    wm, tn_ref[py], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)      # [p(px), C]
                o_ref[0, i, py * p:(py + 1) * p] = acc.astype(o_ref.dtype)

        return branch

    def wide_branch(f_ref, wl):
        def branch(i, g):
            wyv = wy_ref[0, g]
            wxv = wx_ref[0, g]
            for j in range(p):
                acc = None
                for u in range(sr):
                    k = j * sr + u
                    lo = scal_ref[0, g, k]
                    rows = f_ref[0, pl.ds(lo, 2), :, :]
                    part = (rows[0].astype(jnp.float32) * wyv[k, 0]
                            + rows[1].astype(jnp.float32) * wyv[k, 1])
                    acc = part if acc is None else acc + part
                t_ref[j] = jnp.pad(acc, ((0, pad_wl - acc.shape[0]), (0, 0)))

            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 32, 1), 1)
            for j7 in range(p):
                ja = j7 * sr
                jb = ja + sr - 1
                lo_a = scal_ref[0, g, s + ja]
                lo_b = scal_ref[0, g, s + jb]
                lo8 = pl.multiple_of((jnp.minimum(lo_a, lo_b) // 8) * 8, 8)
                win = t_ref[:, pl.ds(lo8, 32), :]
                w32 = jnp.zeros((1, 32, 1), jnp.float32)
                for u in range(sr):
                    jx = j7 * sr + u
                    d = scal_ref[0, g, s + jx] - lo8
                    w32 = (w32 + jnp.where(lane == d, wxv[jx, 0], 0.0)
                           + jnp.where(lane == d + 1, wxv[jx, 1], 0.0))
                acc = jnp.sum(win * (w32 * inv), axis=1)     # [p(py), C]
                st_ref[j7 * p:(j7 + 1) * p] = acc            # px-major stage
            perm = _transpose_perm_matrix(p)
            out = jax.lax.dot_general(
                perm, st_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # row-major
            o_ref[0, i] = out.astype(o_ref.dtype)

        return branch

    branches = [narrow_branch(f3_ref),
                wide_branch(f3_ref, level_shapes[0][1]),
                narrow_branch(f4_ref),
                wide_branch(f4_ref, level_shapes[1][1]),
                narrow_branch(f5_ref),
                wide_branch(f5_ref, level_shapes[2][1])]

    def roi_loop(i, _):
        g = block * rb + i
        jax.lax.switch(scal_ref[0, g, 2 * s], branches, i, g)
        return 0

    jax.lax.fori_loop(0, rb, roi_loop, 0)


def _kernel_v3(level_shapes, f3_ref, f4_ref, f5_ref, scal_ref, wy_ref,
               wx_ref, o_ref, t_ref, tn_ref, *, rb: int, s: int, p: int,
               sr: int, pad_wl: int):
    """Narrow-window variant of ``_kernel_v2``.

    FPN level assignment bounds a normal-aspect ROI's on-level extent to
    ≲ 36 cells, so both passes can work inside ONE 8-aligned ``_WIN``-wide
    window per ROI: the y-pass interpolates [2, _WIN, C] slices instead of
    full [2, Wl, C] rows (2.7× less VPU work on p3) and the x-pass reads
    the static window scratch with no per-column dynamic slice.  Aspect-
    extreme ROIs (x extent > _WIN-2 cells) take the full-row branch.
    The output tile is FLAT [1, RB, p·p, C] in (px, py)-major store
    order (each x-pass column writes p contiguous rows), so the pooled
    grid needs no post-kernel 7×7 reshape.
    All per-ROI scalars ride ONE packed SMEM array ``scal_ref``
    [1, R, 2s+2] — cols [0,s) y band starts, [s,2s) x band starts, 2s the
    branch index (level*2 + 1 if wide), 2s+1 the aligned window start —
    because every separate SMEM input window pads its last dim to 128
    lanes × 2 buffers (~300 KB of the ~1 MB SMEM budget each).  Features
    must be W-padded by ≥ _WIN so border windows stay in bounds.
    """
    block = pl.program_id(1)
    inv = 1.0 / (sr * sr)

    def narrow_branch(f_ref):
        def branch(i, g):
            wyv = wy_ref[0, g]
            wxv = wx_ref[0, g]
            xs = scal_ref[0, g, 2 * s + 1]

            for j in range(p):                  # windowed, folded y-pass
                acc = None
                for u in range(sr):
                    k = j * sr + u
                    lo = scal_ref[0, g, k]
                    rows = f_ref[0, pl.ds(lo, 2),
                                 pl.ds(pl.multiple_of(xs, 8), _WIN), :]
                    w0 = wyv[k, 0].astype(rows.dtype)
                    w1 = wyv[k, 1].astype(rows.dtype)
                    part = rows[0] * w0 + rows[1] * w1       # [_WIN, C]
                    acc = part if acc is None else acc + part
                tn_ref[j] = acc

            lane = jax.lax.broadcasted_iota(jnp.int32, (1, _WIN, 1), 1)
            win = tn_ref[...]                   # [p, _WIN, C] static read
            for j7 in range(p):
                w48 = jnp.zeros((1, _WIN, 1), jnp.float32)
                for u in range(sr):
                    jx = j7 * sr + u
                    d = scal_ref[0, g, s + jx] - xs
                    w48 = (w48 + jnp.where(lane == d, wxv[jx, 0], 0.0)
                           + jnp.where(lane == d + 1, wxv[jx, 1], 0.0))
                acc = jnp.sum(win.astype(jnp.float32) * (w48 * inv), axis=1)
                o_ref[0, i, j7 * p:(j7 + 1) * p] = acc.astype(o_ref.dtype)

        return branch

    def wide_branch(f_ref, wl):
        def branch(i, g):
            wyv = wy_ref[0, g]
            wxv = wx_ref[0, g]
            for j in range(p):
                acc = None
                for u in range(sr):
                    k = j * sr + u
                    lo = scal_ref[0, g, k]
                    rows = f_ref[0, pl.ds(lo, 2), :, :]
                    w0 = wyv[k, 0].astype(rows.dtype)
                    w1 = wyv[k, 1].astype(rows.dtype)
                    part = rows[0] * w0 + rows[1] * w1
                    acc = part if acc is None else acc + part
                t_ref[j] = jnp.pad(acc, ((0, pad_wl - acc.shape[0]), (0, 0)))

            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 32, 1), 1)
            for j7 in range(p):
                ja = j7 * sr
                jb = ja + sr - 1
                lo_a = scal_ref[0, g, s + ja]
                lo_b = scal_ref[0, g, s + jb]
                lo8 = pl.multiple_of((jnp.minimum(lo_a, lo_b) // 8) * 8, 8)
                win = t_ref[:, pl.ds(lo8, 32), :]
                w32 = jnp.zeros((1, 32, 1), jnp.float32)
                for u in range(sr):
                    jx = j7 * sr + u
                    d = scal_ref[0, g, s + jx] - lo8
                    w32 = (w32 + jnp.where(lane == d, wxv[jx, 0], 0.0)
                           + jnp.where(lane == d + 1, wxv[jx, 1], 0.0))
                acc = jnp.sum(win.astype(jnp.float32) * (w32 * inv), axis=1)
                o_ref[0, i, j7 * p:(j7 + 1) * p] = acc.astype(o_ref.dtype)

        return branch

    branches = [narrow_branch(f3_ref),
                wide_branch(f3_ref, level_shapes[0][1]),
                narrow_branch(f4_ref),
                wide_branch(f4_ref, level_shapes[1][1]),
                narrow_branch(f5_ref),
                wide_branch(f5_ref, level_shapes[2][1])]

    def roi_loop(i, _):
        g = block * rb + i
        jax.lax.switch(scal_ref[0, g, 2 * s], branches, i, g)
        return 0

    jax.lax.fori_loop(0, rb, roi_loop, 0)


def multilevel_roi_align_mxu(features: Sequence, rois,
                             spatial_scales: Sequence[float],
                             output_size: int = 7, sampling_ratio: int = 2,
                             aligned: bool = True, roi_block: int = 50,
                             canonical_box_size: float = 224.0,
                             canonical_level: int = 4,
                             version: int | None = None,
                             flat: bool = False):
    """Drop-in replacement for ops.roi_align.multilevel_roi_align backed by
    the Pallas banded-separable kernel (3-level FPN; other configurations
    fall back to the gather formulation).  ``version=4`` (default; env
    override DIFFUSIONVID_ROI_FWD_VERSION) runs the narrow branch's x-pass
    as one small MXU dot per output row against a precomputed per-ROI
    weight matrix and emits the flat tile row-major; ``version=3`` is the
    round-3 one-hot VPU x-pass; ``version=2`` folds the 2×2 sampling mean
    into both passes; ``version=1`` keeps the round-2 kernel for
    comparison.  ``flat=True`` returns the pooled grid as a FLAT
    [B, R, p·p, C] tile in **row-major (py, px)** order — the torch
    flatten order, so order-sensitive consumers (DynamicConv's
    out-projection) use converted checkpoints unmodified, and the kernel
    skips two HBM relayouts (the y/x transpose AND the sublane re-pad of
    merging 7·7 → 49, ~0.4 ms per decoder stage together)."""
    import os

    from .roi_align import multilevel_roi_align

    if version is None:
        version = int(os.environ.get("DIFFUSIONVID_ROI_FWD_VERSION", "4"))
    p, sr = output_size, sampling_ratio
    s = p * sr
    b, r = rois.shape[:2]
    c = features[0].shape[-1]
    if len(features) != 3 or r % roi_block != 0:
        out = multilevel_roi_align(features, rois, spatial_scales,
                                   output_size, sampling_ratio, aligned)
        if flat:
            return out.reshape(b, r, p * p, c)
        return out

    min_level = int(round(-math.log2(spatial_scales[0])))
    level = fpn_level_assignment(rois, 3, min_level, canonical_box_size,
                                 canonical_level)        # [B, R] in {0,1,2}

    ts = (jnp.arange(p)[:, None]
          + (jnp.arange(sr)[None, :] + 0.5) / sr).reshape(-1)
    half = 0.5 if aligned else 0.0
    rf = rois.astype(jnp.float32)

    scales = jnp.asarray(spatial_scales, jnp.float32)[level]          # [B,R]
    hs = jnp.asarray([f.shape[1] for f in features], jnp.int32)[level]
    ws = jnp.asarray([f.shape[2] for f in features], jnp.int32)[level]

    x1 = rf[..., 0] * scales - half
    y1 = rf[..., 1] * scales - half
    bw = (rf[..., 2] - rf[..., 0]) * scales
    bh = (rf[..., 3] - rf[..., 1]) * scales
    if not aligned:
        bw = jnp.maximum(bw, 1.0)
        bh = jnp.maximum(bh, 1.0)
    ys = y1[..., None] + (bh / p)[..., None] * ts        # [B,R,s]
    xs = x1[..., None] + (bw / p)[..., None] * ts

    y0, wy0, wy1 = _band_params(ys, hs[..., None])
    x0, wx0, wx1 = _band_params(xs, ws[..., None])
    wy = jnp.stack([wy0, wy1], axis=-1)                  # [B,R,s,2]
    wx = jnp.stack([wx0, wx1], axis=-1)

    shapes = [(f.shape[1], f.shape[2]) for f in features]

    grid = (b, r // roi_block)
    if version == 4:
        features = [jnp.pad(f, ((0, 0), (0, 0), (0, _WIN), (0, 0)))
                    for f in features]
        pshapes = [(f.shape[1], f.shape[2]) for f in features]
        pad_wl = max(w for _, w in pshapes) + 32
        xs = (jnp.min(x0, axis=-1) // 8) * 8                 # [B, R]
        wide = (jnp.max(x0, axis=-1) - xs) > (_WIN - 2)
        br = level * 2 + wide.astype(jnp.int32)
        scal = jnp.concatenate(
            [y0, x0, br[..., None], xs[..., None]], axis=-1)  # [B, R, 2s+2]
        # per-ROI x weight matrix for the MXU x-pass: one-hot band weights
        # at window-relative offsets, sr sample columns folded per output
        # column, ×1/sr² — [B, R, p, _WIN] fp32 (≈3 MB per 8-frame call)
        d = (x0 - xs[..., None])[..., None]                  # [B, R, s, 1]
        lanes = jnp.arange(_WIN)
        oh = ((d == lanes) * wx0[..., None]
              + (d + 1 == lanes) * wx1[..., None])           # [B, R, s, _WIN]
        wxm = oh.reshape(b, r, p, sr, _WIN).sum(3) / (sr * sr)
        out = pl.pallas_call(
            functools.partial(_kernel_v4, shapes, rb=roi_block, s=s, p=p,
                              sr=sr, pad_wl=pad_wl),
            out_shape=jax.ShapeDtypeStruct((b, r, p * p, c),
                                           features[0].dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, *pshapes[0], c), lambda i, j: (i, 0, 0, 0)),
                pl.BlockSpec((1, *pshapes[1], c), lambda i, j: (i, 0, 0, 0)),
                pl.BlockSpec((1, *pshapes[2], c), lambda i, j: (i, 0, 0, 0)),
                pl.BlockSpec((1, r, 2 * s + 2), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, r, s, 2), lambda i, j: (i, 0, 0, 0)),
                pl.BlockSpec((1, r, p, _WIN), lambda i, j: (i, 0, 0, 0)),
                pl.BlockSpec((1, r, s, 2), lambda i, j: (i, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, roi_block, p * p, c),
                                   lambda i, j: (i, j, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((p, _WIN, c), jnp.float32),
                pltpu.VMEM((p, pad_wl, c), jnp.float32),
                pltpu.VMEM((p * p, c), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(features[0], features[1], features[2], scal, wy, wxm, wx)
        if flat:
            return out                     # row-major (py, px) flat tile
        return out.reshape(b, r, p, p, c)  # row-major == y-major 5D

    if version == 3:
        # W-pad so any 8-aligned _WIN window starting ≤ Wl-2 is in bounds;
        # the pad columns only meet zero x-weights (outside the bands).
        # Band params above used the ORIGINAL widths, preserving borders.
        features = [jnp.pad(f, ((0, 0), (0, 0), (0, _WIN), (0, 0)))
                    for f in features]
        pshapes = [(f.shape[1], f.shape[2]) for f in features]
        pad_wl = max(w for _, w in pshapes) + 32
        xs = (jnp.min(x0, axis=-1) // 8) * 8                 # [B, R]
        wide = (jnp.max(x0, axis=-1) - xs) > (_WIN - 2)
        br = level * 2 + wide.astype(jnp.int32)
        # one packed SMEM array: [y0 | x0 | branch | window start]
        scal = jnp.concatenate(
            [y0, x0, br[..., None], xs[..., None]], axis=-1)  # [B, R, 2s+2]
        out = pl.pallas_call(
            functools.partial(_kernel_v3, shapes, rb=roi_block, s=s, p=p,
                              sr=sr, pad_wl=pad_wl),
            out_shape=jax.ShapeDtypeStruct((b, r, p * p, c),
                                           features[0].dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, *pshapes[0], c), lambda i, j: (i, 0, 0, 0)),
                pl.BlockSpec((1, *pshapes[1], c), lambda i, j: (i, 0, 0, 0)),
                pl.BlockSpec((1, *pshapes[2], c), lambda i, j: (i, 0, 0, 0)),
                pl.BlockSpec((1, r, 2 * s + 2), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, r, s, 2), lambda i, j: (i, 0, 0, 0)),
                pl.BlockSpec((1, r, s, 2), lambda i, j: (i, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, roi_block, p * p, c),
                                   lambda i, j: (i, j, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((p, pad_wl, c), features[0].dtype),
                pltpu.VMEM((p, _WIN, c), features[0].dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(features[0], features[1], features[2], scal, wy, wx)
        if flat:
            # v3 stores (px, py)-major; the flat contract is row-major —
            # permute positions in XLA (v4 emits row-major natively)
            perm = (jnp.arange(p * p) % p) * p + jnp.arange(p * p) // p
            return out[:, :, perm, :]
        return (out.reshape(b, r, p, p, c).transpose(0, 1, 3, 2, 4))

    pad_wl = max(w for _, w in shapes) + 32
    kern = _kernel_v2 if version == 2 else _kernel
    scratch_rows = p if version == 2 else s
    out = pl.pallas_call(
        functools.partial(kern, shapes, rb=roi_block, s=s, p=p, sr=sr,
                          pad_wl=pad_wl),
        out_shape=jax.ShapeDtypeStruct((b, r, p, p, c), features[0].dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, *shapes[0], c), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((1, *shapes[1], c), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((1, *shapes[2], c), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((1, r, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, r, s), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, r, s), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, r, s, 2), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((1, r, s, 2), lambda i, j: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, roi_block, p, p, c),
                               lambda i, j: (i, j, 0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((scratch_rows, pad_wl, c),
                                   features[0].dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(features[0], features[1], features[2], level[..., None], y0, x0, wy, wx)

    # v1/v2 kernels emit x-major [.., j7, i7, C]: transpose the tiny pair
    out = out.transpose(0, 1, 3, 2, 4)
    if flat:
        return out.reshape(b, r, p * p, c)    # row-major flatten
    return out


def _bwd_kernel(f_hw, b_idx_unused, g_ref, scal_ref, wy_ref, wx_ref, o_ref,
                v_ref, *, rb: int, s: int, p: int, sr: int):
    """Feature-gradient kernel for ONE FPN level.

    Transpose of the banded-separable forward: per ROI, the x-pass
    transpose scatters the pooled cotangent into full-width sample-row
    gradients via one-hot column weights (built exactly like the
    forward's window weights, over the full level width — no dynamic
    sublane stores), then the y-pass transpose adds each sample row into
    its 2-row feature band (dynamic slicing only on the outer H dim,
    the forward's proven addressing pattern, store direction).

    g_ref   [1, RB, p·p, C]  pooled cotangent, x-major flat (px, py)
    scal_ref [1, R, 2s+1] SMEM — y0 bands | x0 bands | level-match flag
    wy_ref/wx_ref [1, R, s, 2] — band weights (already include the
        forward's border zeroing; out-of-level ROIs ride the flag)
    o_ref   [1, Hl, Wl, C] fp32 — dF for this level, REVISITED across the
        ROI-block grid dim and zero-initialised at block 0
    v_ref   scratch [Wl, p, C] fp32 — per-ROI full-width row gradients
        (v[:, i7, :] = Σ_j7 wcol_j7 ⊗ g[i7, j7, :], inv-folded)
    """
    hl, wl = f_hw
    block = pl.program_id(1)
    c = v_ref.shape[-1]
    inv = 1.0 / (sr * sr)

    @pl.when(block == 0)
    def _init():
        o_ref[0] = jnp.zeros((hl, wl, c), o_ref.dtype)

    col = jax.lax.broadcasted_iota(jnp.int32, (wl, 1, 1), 0)

    def one_roi(i, g):
        wxv = wx_ref[0, g]
        wyv = wy_ref[0, g]

        # x-pass transpose: v[:, i7, :] = Σ_j7 wcol_j7[col] · g[i7, j7, :]
        acc = None
        for j7 in range(p):
            wcol = jnp.zeros((wl, 1, 1), jnp.float32)
            for u in range(sr):
                jx = j7 * sr + u
                x0 = scal_ref[0, g, s + jx]
                wcol = (wcol + jnp.where(col == x0, wxv[jx, 0], 0.0)
                        + jnp.where(col == x0 + 1, wxv[jx, 1], 0.0))
            grow = g_ref[0, i, j7 * p:(j7 + 1) * p, :]     # [p(i7), C]
            part = wcol * (grow.astype(jnp.float32) * inv)[None]
            acc = part if acc is None else acc + part      # [Wl, p, C]
        v_ref[...] = acc

        # y-pass transpose: 2-row banded adds at dynamic H offsets
        for k in range(s):
            lo = scal_ref[0, g, k]
            vi = v_ref[:, k // sr, :]                       # [Wl, C]
            rows = o_ref[0, pl.ds(lo, 2), :, :]
            add = jnp.concatenate([(wyv[k, 0] * vi)[None],
                                   (wyv[k, 1] * vi)[None]], axis=0)
            o_ref[0, pl.ds(lo, 2), :, :] = rows + add

    def roi_loop(i, _):
        g = block * rb + i
        jax.lax.cond(scal_ref[0, g, 2 * s] > 0,
                     lambda: one_roi(i, g), lambda: None)
        return 0

    jax.lax.fori_loop(0, rb, roi_loop, 0)


def multilevel_roi_align_bwd_mxu(g_flat, rois, feature_shapes,
                                 spatial_scales: Sequence[float],
                                 output_size: int = 7,
                                 sampling_ratio: int = 2,
                                 aligned: bool = True, roi_block: int = 25,
                                 canonical_box_size: float = 224.0,
                                 canonical_level: int = 4,
                                 out_dtype=jnp.float32):
    """Feature gradients of ``multilevel_roi_align`` (flat output layout)
    via the banded transpose kernel — one pallas_call per FPN level
    (keeps each level's fp32 dF VMEM-resident; grid (B, ROI-blocks)
    with the dF block revisited and accumulated across ROI blocks).

    g_flat [B, R, p·p, C] **row-major (py, px)** cotangent (the v4 flat
    contract) → list of per-level dF [B, Hl, Wl, C] in ``out_dtype``.
    The kernel's proven addressing is px-major, so the cotangent is
    permuted once in XLA first (one [B·R, 49, C] relayout).  Box
    gradients are zero, like the reference CUDA backward
    (ROIAlign_cuda.cu backward: atomicAdd into the feature grad only)."""
    p, sr = output_size, sampling_ratio
    s = p * sr
    b, r = rois.shape[:2]
    c = g_flat.shape[-1]
    perm = (jnp.arange(p * p) % p) * p + jnp.arange(p * p) // p
    g_flat = g_flat[:, :, perm, :]     # row-major → px-major for the kernel

    min_level = int(round(-math.log2(spatial_scales[0])))
    level = fpn_level_assignment(rois, len(feature_shapes), min_level,
                                 canonical_box_size, canonical_level)

    ts = (jnp.arange(p)[:, None]
          + (jnp.arange(sr)[None, :] + 0.5) / sr).reshape(-1)
    half = 0.5 if aligned else 0.0
    rf = rois.astype(jnp.float32)

    scales = jnp.asarray(spatial_scales, jnp.float32)[level]
    hs = jnp.asarray([fs[0] for fs in feature_shapes], jnp.int32)[level]
    ws = jnp.asarray([fs[1] for fs in feature_shapes], jnp.int32)[level]

    x1 = rf[..., 0] * scales - half
    y1 = rf[..., 1] * scales - half
    bw = (rf[..., 2] - rf[..., 0]) * scales
    bh = (rf[..., 3] - rf[..., 1]) * scales
    if not aligned:
        bw = jnp.maximum(bw, 1.0)
        bh = jnp.maximum(bh, 1.0)
    ys = y1[..., None] + (bh / p)[..., None] * ts
    xs = x1[..., None] + (bw / p)[..., None] * ts

    y0, wy0, wy1 = _band_params(ys, hs[..., None])
    x0, wx0, wx1 = _band_params(xs, ws[..., None])
    wy = jnp.stack([wy0, wy1], axis=-1)
    wx = jnp.stack([wx0, wx1], axis=-1)

    grads = []
    grid = (b, r // roi_block)
    for li, (hl, wl) in enumerate(feature_shapes):
        match = (level == li).astype(jnp.int32)
        scal = jnp.concatenate([y0, x0, match[..., None]], axis=-1)
        df = pl.pallas_call(
            functools.partial(_bwd_kernel, (hl, wl), li, rb=roi_block,
                              s=s, p=p, sr=sr),
            out_shape=jax.ShapeDtypeStruct((b, hl, wl, c), jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, roi_block, p * p, c),
                             lambda i, j: (i, j, 0, 0)),
                pl.BlockSpec((1, r, 2 * s + 1), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, r, s, 2), lambda i, j: (i, 0, 0, 0)),
                pl.BlockSpec((1, r, s, 2), lambda i, j: (i, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, hl, wl, c),
                                   lambda i, j: (i, 0, 0, 0)),
            scratch_shapes=[pltpu.VMEM((wl, p, c), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(g_flat, scal, wy, wx)
        grads.append(df.astype(out_dtype))
    return grads
