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
  * heads are extracted with *static lane slices* ``x[:, :, j·dh:(j+1)·dh]``
    stacked on a leading implicit dim (supported at 32-element offsets),
    and merged back with a lane-dim concatenate;
  * attention over the stripe's T windows runs as ONE pair of batched
    [h·T, 49, ·] ``dot_general``s with a vectorized softmax between —
    the earlier per-window ``fori_loop`` was issue-rate bound (786 ns
    per window of tiny slices + [h,49,32] dots; 2.56 ms per stage-0
    block of Swin-B, round-5 profile);
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


def _attention_stripe(q_s, k_s, v_s, bias, mask_ref, o_s, *, h: int,
                      t: int, scale: float, compute_dtype):
    """Attention over all T windows of a stripe AT ONCE — batched
    [h·T, 49, ·] dots instead of a per-window ``fori_loop`` (the loop
    form was issue-rate bound: stage-0 of Swin-B spent 2.56 ms/block on
    ~3 GFLOP of attention — 786 ns per window iteration of tiny VPU
    slices + [h,49,32] dots; round-5 profile).  Heads are extracted
    with static lane slices ONCE per stripe and batched on the leading
    (head-major) dim; softmax runs vectorized over the whole
    [h, T, 49, 49] score block.  ``mask_ref`` is the [1, T, 49, 49]
    input ref, or None."""
    c = q_s.shape[-1]
    dh = c // h
    n = q_s.shape[1]

    def heads(ref):
        x = ref[...]                               # [T, n, C]
        return jnp.concatenate(
            [x[:, :, j * dh:(j + 1) * dh] for j in range(h)],
            axis=0)                                # [h·T, n, dh] head-major

    qh, kh, vh = heads(q_s), heads(k_s), heads(v_s)
    # [h·T, n, dh] @ [h·T, n, dh]^T -> [h·T, n, n], fp32 accumulation
    s = jax.lax.dot_general(
        qh, kh, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    # matches the XLA path: scores cross to the softmax in the
    # compute dtype (bf16 on TPU), bias/mask/softmax in fp32
    s = s.astype(compute_dtype).astype(jnp.float32)
    s4 = s.reshape(h, t, n, n) + bias[:, None]     # leading-dim split only
    if mask_ref is not None:
        s4 = s4 + mask_ref[0][None]
    s4 = s4 - jnp.max(s4, axis=-1, keepdims=True)
    e = jnp.exp(s4)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(compute_dtype)
    # [h·T, n, n] @ [h·T, n, dh] -> [h·T, n, dh]
    o = jax.lax.dot_general(
        p.reshape(h * t, n, n), vh, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o4 = o.reshape(h, t, n, dh)
    o_s[...] = jnp.concatenate([o4[j] for j in range(h)],
                               axis=-1).astype(o_s.dtype)


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


def _kernel_block_attn(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, bias_ref,
                       wproj_ref, bproj_ref, o_ref, o_s, q_s, k_s, v_s,
                       *, w: int, h: int, t: int, scale: float,
                       eps: float, hp: int, valid_hw, shift: int,
                       mask_ref=None):
    """v3: one whole Swin attention half-block per stripe —
    LN1 → pad-zero → (pre-rolled) window attention → out-proj → +residual.

    The stripe of the residual stream crosses HBM exactly twice (read x,
    write x + attn); LN statistics, the q/k/v maps, the score tensor and
    the projection all live in VMEM.  ``valid_hw`` is the true (H, W)
    before window padding; the pad region of the LN output is re-zeroed
    in rolled coordinates (the caller rolls x BEFORE the kernel — LN and
    the zero-mask are per-token, so they commute with the roll; the mask
    formula shifts by ``shift`` to address rolled positions)."""
    c = x_ref.shape[-1]
    n = w * w
    xs = x_ref[0]                                     # [w, t·w, C] bf16
    # LayerNorm over lanes in fp32 (models/heads.py:LayerNorm semantics)
    xf = xs.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = (y * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32))
    hv, wv = valid_hw
    wp = t * w
    if (hp, wp) != (hv, wv):
        # zero the window-padding region (reference: pad the norm1 output
        # with zeros, swintransformer.py:256-292) — in rolled coords.
        # The 0/1 multiply happens on the fp32 LN value (Mosaic only
        # broadcasts an inserted minor dim for 32-bit types); masking
        # before vs after the bf16 round is bit-identical for a 0/1 mask.
        j = pl.program_id(1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (w, wp), 0) + j * w
        cols = jax.lax.broadcasted_iota(jnp.int32, (w, wp), 1)
        ok = (((rows + shift) % hp) < hv) & (((cols + shift) % wp) < wv)
        # cast BEFORE inserting the minor dim: Mosaic only broadcasts an
        # inserted minor dim for 32-bit types (bool is not one)
        y = y * ok.astype(jnp.float32)[:, :, None]
    x = _win_relayout(y.astype(xs.dtype), w, t).reshape(t * n, c)

    def proj(lo, s_ref):
        z = jax.lax.dot_general(
            x, wqkv_ref[lo:lo + c, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        z = z + bqkv_ref[0, lo:lo + c].astype(jnp.float32)
        s_ref[...] = z.astype(x.dtype).reshape(t, n, c)

    proj(0, q_s), proj(c, k_s), proj(2 * c, v_s)
    _attention_stripe(q_s, k_s, v_s, bias_ref[...], mask_ref, o_s, h=h,
                      t=t, scale=scale, compute_dtype=x.dtype)
    om = o_s[...].reshape(t * n, c)
    out = jax.lax.dot_general(
        om, wproj_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    out = (out + bproj_ref[0].astype(jnp.float32)).astype(xs.dtype)
    o_ref[0] = xs + _win_relayout_inv(out.reshape(t, n, c), w, t)


def _kernel_block_attn_masked(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref,
                              bias_ref, wproj_ref, bproj_ref, mask_ref,
                              o_ref, o_s, q_s, k_s, v_s, **kw):
    _kernel_block_attn(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, bias_ref,
                       wproj_ref, bproj_ref, o_ref, o_s, q_s, k_s, v_s,
                       mask_ref=mask_ref, **kw)


def fused_swin_block_attn(x, ln_g, ln_b, wqkv, bqkv, bias, mask,
                          wproj, bproj, window: int, num_heads: int,
                          valid_hw, shift: int = 0, eps: float = 1e-5):
    """v3 fused attention half-block (inference path).

    x      : [B, Hp, Wp, C] residual stream, PRE-ROLLED when shift > 0
    ln_g/b : [C] norm1 params;  wqkv [3C, C]; bqkv [3C]
    bias   : [h, w², w²] fp32;  mask [nWh, nWw, w², w²] fp32 or None
    wproj  : [C, C] torch-layout out-projection;  bproj [C]
    valid_hw: true (H, W) before window padding (pad-zero semantics)
    shift  : the SW-MSA roll applied by the caller (mask addressing)
    →        [B, Hp, Wp, C]   x + attn_block(x)   (still rolled)
    """
    b, hp, wp, c = x.shape
    w = window
    h = num_heads
    t = wp // w
    nwh = hp // w
    scale = float((c // h) ** -0.5)
    stripe = pl.BlockSpec((1, w, wp, c), lambda i, j: (i, j, 0, 0))
    vec = lambda m: pl.BlockSpec((1, m), lambda i, j: (0, 0))
    in_specs = [stripe, vec(c), vec(c),
                pl.BlockSpec((3 * c, c), lambda i, j: (0, 0)),
                vec(3 * c),
                pl.BlockSpec((h, w * w, w * w), lambda i, j: (0, 0, 0)),
                pl.BlockSpec((c, c), lambda i, j: (0, 0)), vec(c)]
    args = [x, ln_g.reshape(1, -1), ln_b.reshape(1, -1),
            wqkv.astype(x.dtype), bqkv.reshape(1, -1), bias,
            wproj.astype(x.dtype), bproj.reshape(1, -1)]
    kern = _kernel_block_attn
    if mask is not None:
        in_specs.append(pl.BlockSpec((1, t, w * w, w * w),
                                     lambda i, j: (j, 0, 0, 0)))
        args.append(mask)
        kern = _kernel_block_attn_masked
    return pl.pallas_call(
        functools.partial(kern, w=w, h=h, t=t, scale=scale, eps=eps,
                          hp=hp, valid_hw=tuple(valid_hw), shift=shift),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, c), x.dtype),
        grid=(b, nwh),
        in_specs=in_specs,
        out_specs=stripe,
        scratch_shapes=[pltpu.VMEM((t, w * w, c), x.dtype)] * 4,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(*args)


def _kernel_block_mlp(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                      o_ref, *, eps: float):
    """v3: the MLP half-block — LN2 → fc1 → GELU(exact) → fc2 → +residual,
    one stripe per grid step, weights resident in VMEM."""
    c = x_ref.shape[-1]
    xs = x_ref[0]                                     # [rows, wp, C]
    rows, wp = xs.shape[0], xs.shape[1]
    xf = xs.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = (y * g_ref[0].astype(jnp.float32)
         + b_ref[0].astype(jnp.float32)).astype(xs.dtype)
    y = y.reshape(rows * wp, c)
    z = jax.lax.dot_general(y, w1_ref[...], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    z = (z + b1_ref[0].astype(jnp.float32)).astype(xs.dtype)
    # exact GELU (nn.gelu approximate=False) in fp32 of the rounded value
    zf = z.astype(jnp.float32)
    z = (0.5 * zf * (1.0 + jax.lax.erf(zf * (2.0 ** -0.5)))).astype(xs.dtype)
    out = jax.lax.dot_general(z, w2_ref[...], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out = (out + b2_ref[0].astype(jnp.float32)).astype(xs.dtype)
    o_ref[0] = xs + out.reshape(rows, wp, c)


def fused_swin_block_mlp(x, ln_g, ln_b, w1, b1, w2, b2, rows: int = 7,
                         eps: float = 1e-5):
    """v3 fused MLP half-block: x + fc2(gelu(fc1(LN2(x)))) — the stripe
    crosses HBM twice; the [4C, C]/[C, 4C] weights stay in VMEM across
    grid steps.  ``rows`` must divide Hp (callers use the window size,
    which divides the padded map)."""
    b, hp, wp, c = x.shape
    assert hp % rows == 0, (hp, rows)
    hidden = w1.shape[0]
    stripe = pl.BlockSpec((1, rows, wp, c), lambda i, j: (i, j, 0, 0))
    vec = lambda m: pl.BlockSpec((1, m), lambda i, j: (0, 0))
    return pl.pallas_call(
        functools.partial(_kernel_block_mlp, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, c), x.dtype),
        grid=(b, hp // rows),
        in_specs=[stripe, vec(c), vec(c),
                  pl.BlockSpec((hidden, c), lambda i, j: (0, 0)),
                  vec(hidden),
                  pl.BlockSpec((c, hidden), lambda i, j: (0, 0)),
                  vec(c)],
        out_specs=stripe,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(x, ln_g.reshape(1, -1), ln_b.reshape(1, -1), w1.astype(x.dtype),
      b1.reshape(1, -1), w2.astype(x.dtype), b2.reshape(1, -1))


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
