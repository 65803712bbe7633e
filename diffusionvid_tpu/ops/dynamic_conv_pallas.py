"""Fused DynamicConv instance-interaction kernel (Pallas, TPU).

DynamicConv (reference ``box_head.py:666-711``) applies two per-proposal
dynamic projections to the 49 pooled positions:

    x1 = relu(LN(roi @ p1))       # [S,49,D] x [S,D,E] -> [S,49,E]
    x2 = relu(LN(x1  @ p2))       # [S,49,E] x [S,E,D] -> [S,49,D]

As XLA batched einsums this is the single most expensive decoder
component on the profile (r5: 5.26 ms of a 27.5 ms R-101 chunk across
the 4 stages): the per-proposal matmuls are tiny ([49,256]x[256,64]),
so the time goes to the relayout copies XLA inserts between the dots,
the un-fused LayerNorms, and the ReLU relayouts — not FLOPs.  This
kernel runs the whole bmm->LN->relu->bmm->LN->relu chain per proposal
block inside VMEM: HBM sees exactly one read of roi/params and one
write of the result (the compulsory traffic).

Both dynamic-parameter tensors arrive in **e-major** [S, E, D] form —
minor dim D=256 (two native 128-lane tiles), so the reshape from the
generating GEMM's flat [S, E*D] output is layout-free.  The d-major
alternative ([S, D, E], minor 64) pads lanes 64→128 and was the
profiled 0.61 ms/chunk relayout in the einsum path.  The first dot is
NT (contract minor of both), the second is NN (contract r1's minor
with p2's sublane dim) — no transposed layouts touch HBM or VMEM.

On-chip adjudication (round 5, R-101 ×1 in-model, near-identical
sessions): e-major kernel **291.5** fps/chip vs NT-einsum 283.6 vs the
first d-major kernel orientation 269.0.  In isolation (50 chained
iters inside one jit, S=2400 bf16) kernel and einsum chain are at
parity (1.15 vs 1.15 ms/stage — both per-dot-overhead-bound, and
insensitive to the proposal block size: _PB 8/16/64 → 1.15/1.12/1.13);
the in-model win is entirely the eliminated relayouts around the
einsum formulation (p2 reshape, un-fused bias add, relu relayouts).

Numerics match the einsum path bit-for-bit in fp32 and match its
rounding discipline in bf16: each dot accumulates fp32 on the MXU, is
rounded to the compute dtype, and the LayerNorm recomputes in fp32
from the rounded value — exactly the ``.astype`` placement of
``models/heads.py:DynamicConv``.

The backward recomputes through the einsum twin (``dynamic_conv_ref``)
under ``jax.vjp`` — the same custom-VJP pattern as the fused Swin
window-attention kernel.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5
# proposals per grid step (unrolled in-kernel); env-tunable for the
# on-chip block-size adjudication (tools/adjudicate_kernels.py / micro)
_PB = int(os.environ.get("DIFFUSIONVID_DYNCONV_PB", "8"))


def _ln_rows(x32, g, b, eps):
    """LayerNorm over the last dim of [P, C] fp32 rows."""
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    return (x32 - mu) * jax.lax.rsqrt(var + eps) * g + b


def _kernel(roi_ref, p1_ref, p2_ref, g1_ref, b1_ref, g2_ref, b2_ref,
            out_ref, *, eps):
    cdtype = roi_ref.dtype
    g1 = g1_ref[:]          # [1, E] fp32
    b1 = b1_ref[:]
    g2 = g2_ref[:]          # [1, D] fp32
    b2 = b2_ref[:]
    if os.environ.get("DIFFUSIONVID_DYNCONV_UNROLL"):
        # per-proposal unrolled form (the round-5 original; kept as the
        # regression reference — the batched form below measured equal
        # or better on-chip and issues _PB× fewer ops)
        for p in range(_PB):
            roi = roi_ref[p]                                     # [P, D]
            a32 = jax.lax.dot_general(
                roi, p1_ref[p], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)              # [P, E]
            a32 = a32.astype(cdtype).astype(jnp.float32)
            r1 = jnp.maximum(_ln_rows(a32, g1, b1, eps), 0.0).astype(cdtype)
            b32 = jax.lax.dot_general(
                r1, p2_ref[p], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)              # [P, D]
            b32 = b32.astype(cdtype).astype(jnp.float32)
            r2 = jnp.maximum(_ln_rows(b32, g2, b2, eps), 0.0)
            out_ref[p] = r2.astype(cdtype)
        return
    # batched over the _PB proposals of the block: one pair of batched
    # dots instead of _PB unrolled pairs.
    # x1 = roi @ p1t^T  (NT: contraction minor on both operands)
    a32 = jax.lax.dot_general(
        roi_ref[...], p1_ref[...], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                  # [PB, P, E]
    # match the einsum path's rounding: round to compute dtype,
    # LayerNorm in fp32 of the rounded value
    a32 = a32.astype(cdtype).astype(jnp.float32)
    r1 = jnp.maximum(_ln_rows(a32, g1, b1, eps), 0.0).astype(cdtype)
    # x2 = r1 @ p2 (NN: p2 is e-major [PB, E, D], contraction on its
    # sublane dim — no transposed operand anywhere)
    b32 = jax.lax.dot_general(
        r1, p2_ref[...], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                  # [PB, P, D]
    b32 = b32.astype(cdtype).astype(jnp.float32)
    out_ref[...] = jnp.maximum(_ln_rows(b32, g2, b2, eps), 0.0).astype(cdtype)


def dynamic_conv_ref(roi, p1t, p2e, g1, b1, g2, b2, eps=_EPS):
    """Einsum twin — identical math to models/heads.py:DynamicConv's
    inline path (used for the custom-VJP backward and as the CPU path).
    ``p2e`` is e-major [S, E, D] (kernel orientation)."""
    cdtype = roi.dtype

    def ln(x, g, b):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        return ((xf - mu) * jax.lax.rsqrt(var + eps) * g + b).astype(x.dtype)

    x = jnp.einsum("spd,sed->spe", roi, p1t,
                   preferred_element_type=jnp.float32).astype(cdtype)
    x = jnp.maximum(ln(x, g1, b1), 0)
    x = jnp.einsum("spe,sed->spd", x, p2e,
                   preferred_element_type=jnp.float32).astype(cdtype)
    return jnp.maximum(ln(x, g2, b2), 0)


def _run_kernel(roi, p1t, p2e, g1, b1, g2, b2, eps, interpret):
    s, p, d = roi.shape
    e = p1t.shape[1]
    pad = (-s) % _PB
    if pad:
        roi = jnp.pad(roi, ((0, pad), (0, 0), (0, 0)))
        p1t = jnp.pad(p1t, ((0, pad), (0, 0), (0, 0)))
        p2e = jnp.pad(p2e, ((0, pad), (0, 0), (0, 0)))
    sp = s + pad
    grid = (sp // _PB,)
    blk = lambda shape: pl.BlockSpec(
        shape, lambda i: (i,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=grid,
        in_specs=[blk((_PB, p, d)), blk((_PB, e, d)), blk((_PB, e, d)),
                  full((1, e)), full((1, e)), full((1, d)), full((1, d))],
        out_specs=blk((_PB, p, d)),
        out_shape=jax.ShapeDtypeStruct((sp, p, d), roi.dtype),
        interpret=interpret,
    )(roi, p1t, p2e, g1.astype(jnp.float32)[None],
      b1.astype(jnp.float32)[None], g2.astype(jnp.float32)[None],
      b2.astype(jnp.float32)[None])
    return out[:s]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def dynamic_conv_fused(roi, p1t, p2e, g1, b1, g2, b2, eps=_EPS,
                       interpret=False):
    """Fused bmm->LN->relu->bmm->LN->relu (trainable: the backward
    recomputes through the einsum twin).

    roi [S,P,D]; p1t [S,E,D] (p1 transposed, e-major) and p2e [S,E,D]
    (p2 in its natural e-major orientation — DynParamLinear's raw flat
    GEMM output reshaped, no relayout); g1/b1 [E], g2/b2 [D] LayerNorm
    params.  Returns [S,P,D] in roi.dtype."""
    return _run_kernel(roi, p1t, p2e, g1, b1, g2, b2, eps, interpret)


def _fwd(roi, p1t, p2e, g1, b1, g2, b2, eps, interpret):
    out = _run_kernel(roi, p1t, p2e, g1, b1, g2, b2, eps, interpret)
    return out, (roi, p1t, p2e, g1, b1, g2, b2)


def _bwd(eps, interpret, res, g):
    roi, p1t, p2e, g1, b1, g2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: dynamic_conv_ref(*a, eps=eps), roi, p1t, p2e,
        g1, b1, g2, b2)
    return vjp(g.astype(roi.dtype))


dynamic_conv_fused.defvjp(_fwd, _bwd)
