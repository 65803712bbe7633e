"""Pallas TPU kernel for Swin shifted-window attention.

The XLA formulation of one Swin block's attention costs four full-map HBM
relayouts (window partition + reverse on the attention input and output)
plus HBM round-trips for the [nW·B, heads, 49, 49] score tensor (bf16
write, fp32 bias/mask add, softmax, bf16 read for attn·V — ~300 MB of
traffic per stage-0 block of Swin-B at 608×1024).  Windows are a purely
local structure, so all of it fuses: this kernel takes the *unpartitioned*
q/k/v feature maps, walks one row of windows per grid step, and emits the
attention output back in map layout.  Each token crosses HBM exactly
twice (read q/k/v, write out).

Reference semantics (including the bf16-score round-trip of the bf16
compute path and the fp32 softmax) match ``models/swin.py:
WindowAttention`` — which itself mirrors
``mega_core/modeling/backbone/swintransformer.py:86-180``.

Mosaic-shaped details (every rule below was adjudicated on the real v5e
chip — round 3's kernels died in Mosaic's infer-vector-layout pass on a
``[t,7,7,C] → [t,49,h,dh]`` shape cast):
  * the LANE dimension is always the full channel width C; reshapes only
    ever split/merge sublane and implicit dims (``[w,t·w,C] ⇄ [t,49,C]``
    lowers; any reshape splitting C into (h, dh) does not);
  * heads are extracted with *static lane slices* ``x[:, j·dh:(j+1)·dh]``
    stacked on a leading implicit dim (supported at 32-element offsets),
    and merged back with a lane-dim concatenate;
  * the per-window loop is a ``fori_loop`` whose dynamic index lands on
    the leading dim of VMEM *refs* (scratch), never on a traced value;
  * the relative-position bias rides along as a full-VMEM [h, 49, 49]
    fp32 block; the SW-MSA mask as a [1, T, 49, 49] stripe block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _win_relayout(x, w: int, t: int):
    """[w, w·T, C] stripe → [T, 49, C] (window-major, row-major inside)."""
    c = x.shape[-1]
    return (x.reshape(w, t, w, c).transpose(1, 0, 2, 3)
            .reshape(t, w * w, c))


def _win_relayout_inv(x, w: int, t: int):
    """[T, 49, C] → [w, w·T, C]."""
    c = x.shape[-1]
    return (x.reshape(t, w, w, c).transpose(1, 0, 2, 3)
            .reshape(w, t * w, c))


def _split_heads(x, h: int, dh: int):
    """[N, C] → [h, N, dh] via static lane slices (no lane-splitting
    reshape — that shape cast is what Mosaic refuses to lower)."""
    return jnp.concatenate(
        [x[:, j * dh:(j + 1) * dh][None] for j in range(h)], axis=0)


def _merge_heads(o, h: int):
    """[h, N, dh] → [N, C] via lane-dim concat of static head slices."""
    return jnp.concatenate([o[j] for j in range(h)], axis=-1)


def _attention_stripe(q_s, k_s, v_s, bias, mask_ref, o_s, *, h: int,
                      t: int, scale: float, compute_dtype):
    """Per-window attention over [T, 49, C] VMEM scratch refs into o_s.
    The loop indexes the scratch REFS with the traced counter — a
    dynamic leading-index load lowers to a vector load with dynamic
    start.  Heads live on a leading implicit dim of in-register values
    only (built by static lane slices).  ``mask_ref`` is the
    [1, T, 49, 49] input ref, or None."""
    c = q_s.shape[-1]
    dh = c // h

    def body(i, _):
        qh = _split_heads(q_s[i], h, dh)           # [h, 49, dh]
        kh = _split_heads(k_s[i], h, dh)
        vh = _split_heads(v_s[i], h, dh)
        # [h, 49, dh] @ [h, 49, dh]^T -> [h, 49, 49], fp32 accumulation
        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        # matches the XLA path: scores cross to the softmax in the
        # compute dtype (bf16 on TPU), bias/mask/softmax in fp32
        s = s.astype(compute_dtype).astype(jnp.float32) + bias
        if mask_ref is not None:
            s = s + mask_ref[0, i][None]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(compute_dtype)
        # [h, 49, 49] @ [h, 49, dh] -> [h, 49, dh]
        o = jax.lax.dot_general(
            p, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_s[i] = _merge_heads(o, h).astype(o_s.dtype)
        return 0

    jax.lax.fori_loop(0, t, body, 0)


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, o_s, q_s, k_s, v_s,
            *, w: int, h: int, t: int, scale: float, mask_ref=None):
    q_s[...] = _win_relayout(q_ref[0], w, t)         # [T, 49, C]
    k_s[...] = _win_relayout(k_ref[0], w, t)
    v_s[...] = _win_relayout(v_ref[0], w, t)
    _attention_stripe(q_s, k_s, v_s, bias_ref[...], mask_ref, o_s, h=h,
                      t=t, scale=scale, compute_dtype=q_ref.dtype)
    o_ref[0] = _win_relayout_inv(o_s[...], w, t)


def _kernel_masked(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref,
                   o_s, q_s, k_s, v_s, **kw):
    _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, o_s, q_s, k_s, v_s,
            mask_ref=mask_ref, **kw)


def _kernel_qkv(x_ref, wqkv_ref, bqkv_ref, bias_ref, o_ref, o_s,
                q_s, k_s, v_s, *, w: int, h: int, t: int, scale: float,
                mask_ref):
    """v2: qkv projections fused in-kernel — the x stripe is read once
    from HBM and the q/k/v maps never exist in HBM at all."""
    c = x_ref.shape[-1]
    bias = bias_ref[...]
    x = _win_relayout(x_ref[0], w, t).reshape(t * w * w, c)

    def proj(lo, s_ref):
        # static row-slice of the [3C, C] weight (a traced-start
        # dynamic_slice_in_dim does not lower on TC even with a
        # constant start — keep it a lax.slice)
        y = jax.lax.dot_general(
            x, wqkv_ref[lo:lo + c, :],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = y + bqkv_ref[0, lo:lo + c].astype(jnp.float32)
        # sublane split t·49 → (t, 49); C stays on lanes
        s_ref[...] = y.astype(x.dtype).reshape(t, w * w, c)

    proj(0, q_s), proj(c, k_s), proj(2 * c, v_s)
    _attention_stripe(q_s, k_s, v_s, bias, mask_ref, o_s, h=h, t=t,
                      scale=scale, compute_dtype=x.dtype)
    o_ref[0] = _win_relayout_inv(o_s[...], w, t)


def _kernel_qkv_nomask(x_ref, wqkv_ref, bqkv_ref, bias_ref, o_ref, o_s,
                       q_s, k_s, v_s, **kw):
    _kernel_qkv(x_ref, wqkv_ref, bqkv_ref, bias_ref, o_ref, o_s,
                q_s, k_s, v_s, mask_ref=None, **kw)


def _kernel_qkv_masked(x_ref, wqkv_ref, bqkv_ref, bias_ref, mask_ref,
                       o_ref, o_s, q_s, k_s, v_s, **kw):
    _kernel_qkv(x_ref, wqkv_ref, bqkv_ref, bias_ref, o_ref, o_s,
                q_s, k_s, v_s, mask_ref=mask_ref, **kw)


def fused_window_attention_qkv(x, wqkv, bqkv, bias, mask, window: int,
                               num_heads: int):
    """v2: windowed MHA with the qkv projection fused into the kernel.

    x     : [B, Hp, Wp, C]   post-LN (pad-zeroed, pre-rolled) map
    wqkv  : [3C, C] torch-layout qkv weight;  bqkv [3C]
    bias  : [h, w², w²] fp32;  mask [nWh, nWw, w², w²] fp32 or None
    →       [B, Hp, Wp, C]  pre-out-projection attention output
    """
    b, hp, wp, c = x.shape
    w = window
    h = num_heads
    t = wp // w
    nwh = hp // w
    scale = float((c // h) ** -0.5)
    stripe = pl.BlockSpec((1, w, wp, c), lambda i, j: (i, j, 0, 0))
    wspec = pl.BlockSpec((3 * c, c), lambda i, j: (0, 0))
    bspec = pl.BlockSpec((1, 3 * c), lambda i, j: (0, 0))
    bias_spec = pl.BlockSpec((h, w * w, w * w), lambda i, j: (0, 0, 0))
    in_specs = [stripe, wspec, bspec, bias_spec]
    args = [x, wqkv.astype(x.dtype), bqkv.reshape(1, -1), bias]
    kern = _kernel_qkv_nomask
    if mask is not None:
        in_specs.append(pl.BlockSpec((1, t, w * w, w * w),
                                     lambda i, j: (j, 0, 0, 0)))
        args.append(mask)
        kern = _kernel_qkv_masked
    return pl.pallas_call(
        functools.partial(kern, w=w, h=h, t=t, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, c), x.dtype),
        grid=(b, nwh),
        in_specs=in_specs,
        out_specs=stripe,
        # o + q/k/v scratch: the attention loop dynamically indexes
        # REFS, not values (see _attention_stripe); all lane-dim C
        scratch_shapes=[pltpu.VMEM((t, w * w, c), x.dtype)] * 4,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(*args)


def _einsum_window_attention_qkv(x, wqkv, bqkv, bias, mask, window: int,
                                 num_heads: int):
    """Pure-jnp twin of the v2 kernel (same semantics incl. the bf16
    score round-trip) — the recompute target for the training VJP."""
    b, hp, wp, c = x.shape
    w = window
    h = num_heads
    dh = c // h
    n = w * w
    wd = wqkv.astype(x.dtype)
    bd = bqkv.astype(x.dtype)
    q = x @ wd[:c].T + bd[:c]
    k = x @ wd[c:2 * c].T + bd[c:2 * c]
    v = x @ wd[2 * c:].T + bd[2 * c:]

    def part(z):
        z = z.reshape(b, hp // w, w, wp // w, w, c).transpose(0, 1, 3, 2, 4, 5)
        return z.reshape(-1, n, h, dh)

    qw, kw, vw = part(q), part(k), part(v)
    nb = qw.shape[0]
    attn = jnp.einsum("bnhd,bmhd->bhnm", qw, kw,
                      preferred_element_type=jnp.float32) * (dh ** -0.5)
    attn = attn.astype(x.dtype).astype(jnp.float32) + bias[None]
    if mask is not None:
        nw = mask.reshape(-1, n, n).shape[0]
        attn = (attn.reshape(nb // nw, nw, h, n, n)
                + mask.reshape(nw, n, n)[None, :, None])
        attn = attn.reshape(nb, h, n, n)
    attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
    ow = jnp.einsum("bhnm,bmhd->bnhd", attn, vw).reshape(
        b, hp // w, wp // w, w, w, c)
    return ow.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_window_attention_qkv_trainable(x, wqkv, bqkv, bias, mask,
                                         window: int, num_heads: int):
    """v2 kernel with a training VJP: the forward runs the fused Pallas
    kernel (one HBM read of x, no q/k/v maps in HBM); the backward
    recomputes through the einsum twin and differentiates it — the fused
    forward's relayout savings carry into train steps while the gradient
    stays the (tested) XLA formulation.  ``mask`` gets a zero cotangent
    (it is a constant SW-MSA mask, never a parameter)."""
    return fused_window_attention_qkv(x, wqkv, bqkv, bias, mask, window,
                                      num_heads)


def _fwa_fwd(x, wqkv, bqkv, bias, mask, window, num_heads):
    out = fused_window_attention_qkv(x, wqkv, bqkv, bias, mask, window,
                                     num_heads)
    return out, (x, wqkv, bqkv, bias, mask)


def _fwa_bwd(window, num_heads, res, g):
    x, wqkv, bqkv, bias, mask = res
    _, vjp = jax.vjp(
        lambda x_, w_, b_, bi_: _einsum_window_attention_qkv(
            x_, w_, b_, bi_, mask, window, num_heads),
        x, wqkv, bqkv, bias)
    gx, gw, gb, gbias = vjp(g)
    gmask = None if mask is None else jnp.zeros_like(mask)
    return (gx, gw, gb, gbias, gmask)


fused_window_attention_qkv_trainable.defvjp(_fwa_fwd, _fwa_bwd)


def fused_window_attention(q, k, v, bias, mask, window: int,
                           num_heads: int | None = None):
    """Windowed MHA over padded feature maps, no partition round-trip.

    q/k/v : [B, Hp, Wp, C]  (Hp, Wp multiples of ``window``)
    bias  : [h, w², w²] fp32  relative-position bias
    mask  : [nWh, nWw, w², w²] fp32 SW-MSA mask, or None
    →       [B, Hp, Wp, C]  pre-projection attention output
    """
    b, hp, wp, c = q.shape
    w = window
    h = bias.shape[0]
    t = wp // w
    nwh = hp // w
    scale = float((c // h) ** -0.5)
    grid = (b, nwh)
    stripe = pl.BlockSpec((1, w, wp, c), lambda i, j: (i, j, 0, 0))
    bias_spec = pl.BlockSpec((h, w * w, w * w), lambda i, j: (0, 0, 0))
    # o + q/k/v scratch (see _attention_stripe)
    scratch = [pltpu.VMEM((t, w * w, c), q.dtype)] * 4
    params = functools.partial(
        _kernel_masked if mask is not None else _kernel,
        w=w, h=h, t=t, scale=scale)
    in_specs = [stripe, stripe, stripe, bias_spec]
    args = [q, k, v, bias]
    if mask is not None:
        in_specs.append(pl.BlockSpec((1, t, w * w, w * w),
                                     lambda i, j: (j, 0, 0, 0)))
        args.append(mask)
    return pl.pallas_call(
        params,
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, c), q.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=stripe,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(*args)
