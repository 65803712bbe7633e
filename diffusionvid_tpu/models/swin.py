"""Swin Transformer backbone in flax.linen — TPU-native, NHWC.

Functional re-design of the reference's Swin implementation
(``mega_core/modeling/backbone/swintransformer.py:86-752``): window
attention with relative position bias, shifted windows, patch merging,
per-output-stage LayerNorm, and the detectron2 size table (T/S/B/B-22k/L,
swintransformer.py:656-712; the flagship uses B-22k + FPN over swin1..3,
``configs/vid_Swin_B_DiffusionVID.yaml:5-13``).

TPU-first notes:
  * all shapes static at trace time — window padding and the shifted-window
    attention mask are computed with numpy from the (static) feature size;
  * window attention runs as one batched [B·nW, heads, w², w²] einsum stack
    that XLA maps straight onto the MXU; no per-window Python loops;
  * parameters keep the torch layout/names (qkv.weight [3C,C], mlp.fc1,
    relative_position_bias_table, …) so released checkpoints port with the
    same renaming scheme as the ResNet path.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .heads import LayerNorm  # torch-layout LN (weight/bias)

SWIN_SIZES = {
    "T": dict(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24), window=7),
    "S": dict(embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24), window=7),
    "B": dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32), window=7),
    "B-22k": dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32), window=7),
    "B-22k-384": dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32), window=12),
    "L-22k": dict(embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48), window=7),
    "L-22k-384": dict(embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48), window=12),
}


def _relative_position_index(w: int) -> np.ndarray:
    """[w², w²] lookup into the (2w-1)² bias table (standard Swin)."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]          # [2, w², w²]
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


def _shift_attn_mask(hp: int, wp: int, w: int, shift: int) -> np.ndarray:
    """Attention mask [nW, w², w²] for SW-MSA (0 keep / -100 block)."""
    img = np.zeros((hp, wp))
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(hp // w, w, wp // w, w).transpose(0, 2, 1, 3).reshape(-1, w * w)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff == 0, 0.0, -100.0).astype(np.float32)


def window_partition(x, w: int):
    """[B, H, W, C] → [B·nW, w·w, C] (H, W divisible by w)."""
    b, h, wd, c = x.shape
    x = x.reshape(b, h // w, w, wd // w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)


def window_reverse(x, w: int, b: int, h: int, wd: int):
    c = x.shape[-1]
    x = x.reshape(b, h // w, wd // w, w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, wd, c)


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (swintransformer.py:86+).

    Takes the (padded, pre-rolled) feature MAP — windowing happens
    inside: on TPU via the fused Pallas kernel
    (`ops/swin_attention_pallas.py`, no partition/reverse relayouts, no
    score-tensor HBM round-trip), elsewhere via window_partition + the
    batched-einsum formulation.  Both share qkv/proj, which are plain
    per-token matmuls in map layout."""

    dim: int
    window: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False, fused_block=None):
        """x [B, Hp, Wp, C]; mask [nW, w², w²] or None → [B, Hp, Wp, C].

        ``fused_block=(ln_g, ln_b, valid_hw, shift)`` selects the v3
        whole-half-block kernel: x is the (pre-rolled) residual stream and
        the return value is ``x + attn_block(x)`` — LN1, pad-zero, window
        attention, out-projection and the residual all fused in one
        Pallas call (inference path; SwinBlock gates it)."""
        b, hp, wpx, c = x.shape
        n = self.window * self.window
        h = self.num_heads
        dh = c // h
        w = self.window

        wqkv = self.param("qkv_weight", nn.initializers.xavier_uniform(), (3 * c, c))
        bqkv = self.param("qkv_bias", nn.initializers.zeros, (3 * c,))

        table = self.param("relative_position_bias_table",
                           nn.initializers.normal(0.02),
                           ((2 * w - 1) ** 2, h))
        idx = jnp.asarray(_relative_position_index(w))
        bias = (table[idx.reshape(-1)].reshape(n, n, h).transpose(2, 0, 1)
                .astype(jnp.float32))

        if fused_block is not None:
            from ..ops.swin_attention_pallas import fused_swin_block_attn
            wp_ = self.param("proj_weight", nn.initializers.xavier_uniform(),
                             (c, c))
            bp_ = self.param("proj_bias", nn.initializers.zeros, (c,))
            ln_g, ln_b, valid_hw, shift = fused_block
            m4 = (None if mask is None else
                  mask.reshape(hp // w, wpx // w, n, n))
            return fused_swin_block_attn(
                x, ln_g, ln_b, wqkv, bqkv, bias, m4, wp_, bp_, w, h,
                valid_hw, shift=shift)

        import os
        # v2 (qkv folded into the kernel) is the adjudicated default:
        # real-chip head-to-head (round 4, tools/adjudicate_kernels.py)
        # measured off=51.9 / v1=73.5 / v2=79.1 fps/chip on Swin-B ×1.
        # DIFFUSIONVID_SWIN_KERNEL=off|v1 selects the other modes.
        kernel_mode = os.environ.get("DIFFUSIONVID_SWIN_KERNEL", "v2")
        if kernel_mode == "v3":
            # v3 is the SwinBlock-level fused-half-block mode; inside
            # WindowAttention (train path, or a caller without
            # fused_block) it degrades to v2
            kernel_mode = "v2"
        # v2 is usable in training too: it carries a custom VJP whose
        # backward recomputes through the einsum twin
        # (ops/swin_attention_pallas.py:_fwa_bwd).  v1 stays
        # inference-only (no VJP).
        use_kernel = (jax.default_backend() in ("tpu", "axon")
                      and hp % w == 0 and wpx % w == 0
                      and kernel_mode in ("v1", "v2")
                      and (not train or kernel_mode == "v2")
                      and not os.environ.get("DIFFUSIONVID_SWIN_NO_KERNEL"))
        m4 = (None if mask is None else
              mask.reshape(hp // w, wpx // w, n, n))
        if use_kernel and kernel_mode == "v2":
            # v2: qkv fused in-kernel — q/k/v maps never touch HBM
            from ..ops.swin_attention_pallas import (
                fused_window_attention_qkv,
                fused_window_attention_qkv_trainable)
            fn = (fused_window_attention_qkv_trainable if train
                  else fused_window_attention_qkv)
            out = fn(x, wqkv, bqkv, bias, m4, w, h)
        elif use_kernel:
            # three matmuls against weight row-slices instead of one matmul
            # + a [B, Hp, Wp, 3, h, dh] reshape-transpose: the split/
            # transpose of the fused qkv was a ~1 ms relayout per block
            wd = wqkv.astype(x.dtype)
            bd = bqkv.astype(x.dtype)
            q = x @ wd[:c].T + bd[:c]
            k = x @ wd[c:2 * c].T + bd[c:2 * c]
            v = x @ wd[2 * c:].T + bd[2 * c:]
            from ..ops.swin_attention_pallas import fused_window_attention
            out = fused_window_attention(q, k, v, bias, m4, w)
        else:
            wd = wqkv.astype(x.dtype)
            bd = bqkv.astype(x.dtype)
            q = x @ wd[:c].T + bd[:c]
            k = x @ wd[c:2 * c].T + bd[c:2 * c]
            v = x @ wd[2 * c:].T + bd[2 * c:]
            qw = window_partition(q, w).reshape(-1, n, h, dh)
            kw = window_partition(k, w).reshape(-1, n, h, dh)
            vw = window_partition(v, w).reshape(-1, n, h, dh)
            nb = qw.shape[0]
            # scores cross HBM in the compute dtype: the [nB, h, 49, 49]
            # score tensor is far too big for VMEM on the low-C stages
            # (~125 MB fp32 at stage0 for a 4-frame chunk) so the
            # matmul→softmax hop is an HBM round-trip — emit bf16 from the
            # MXU epilogue (accumulation is fp32 on the MXU regardless) and
            # upcast inside the softmax fusion.  Matches the reference's
            # fp16-autocast scores; in fp32 mode (the parity tests) a no-op.
            attn = jnp.einsum("bnhd,bmhd->bhnm", qw, kw,
                              preferred_element_type=jnp.float32) * (dh ** -0.5)
            attn = attn.astype(x.dtype)
            attn = attn.astype(jnp.float32) + bias[None]
            if mask is not None:
                nw = mask.shape[0]
                attn = attn.reshape(nb // nw, nw, h, n, n) + mask[None, :, None]
                attn = attn.reshape(nb, h, n, n)
            attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
            outw = jnp.einsum("bhnm,bmhd->bnhd", attn, vw).reshape(nb, n, c)
            out = window_reverse(outw, w, b, hp, wpx)

        wp = self.param("proj_weight", nn.initializers.xavier_uniform(), (c, c))
        bp = self.param("proj_bias", nn.initializers.zeros, (c,))
        return out @ wp.T.astype(x.dtype) + bp.astype(x.dtype)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, orig_hw=None, train: bool = False):
        """x [B, Hp, Wp, C], already padded to window multiples by the
        stage loop (``orig_hw`` = true (H, W); None ⇒ no padding).

        The residual stream stays PADDED across the whole stage — the
        per-block pad/crop copies the reference pays
        (swintransformer.py:256-292: F.pad after norm1, crop after
        window_reverse) are hoisted out of the block loop.  Numerics are
        unchanged: attention is the only cross-pixel op, and its input's
        pad region is re-zeroed here after norm1, which is exactly the
        reference's "pad the norm1 output with zeros".  Everything else
        (LN/MLP/residual) is per-pixel, and the stage crops before any
        consumer.  On TPU the per-block pad/crop were full-map relayout
        copies on the big low-C stages — pure win."""
        b, hp, wp, c = x.shape
        h, wd = orig_hw if orig_hw is not None else (hp, wp)
        w = self.window
        shift = self.shift if min(hp, wp) > w else 0

        import os
        # v3 (whole half-blocks fused: LN1+qkv+attn+proj+residual in one
        # Pallas call, LN2+MLP+residual in a second) is the round-5
        # default — the XLA LN/roll/residual ops between the v2 kernels
        # ran at ~40 GB/s effective vs the chip's 354 GB/s elementwise
        # (round-5 micro), and fusing them halved the Swin-B block cost.
        kernel_mode = os.environ.get("DIFFUSIONVID_SWIN_KERNEL", "v3")
        use_v3 = (jax.default_backend() in ("tpu", "axon")
                  and kernel_mode == "v3" and not train
                  and hp % w == 0 and wp % w == 0
                  and not os.environ.get("DIFFUSIONVID_SWIN_NO_KERNEL"))
        if use_v3:
            g1, b1 = LayerNorm(c, name="norm1")(params_only=True)
            if shift > 0:
                xr = jnp.roll(x, (-shift, -shift), axis=(1, 2))
                mask = jnp.asarray(_shift_attn_mask(hp, wp, w, shift))
            else:
                xr, mask = x, None
            y = WindowAttention(c, w, self.num_heads, dtype=self.dtype,
                                name="attn")(
                xr, mask, train=False,
                fused_block=(g1, b1, (h, wd), shift))
            if shift > 0:
                y = jnp.roll(y, (shift, shift), axis=(1, 2))
            g2, b2 = LayerNorm(c, name="norm2")(params_only=True)
            hidden = int(c * self.mlp_ratio)
            w1 = self.param("mlp_fc1_weight", nn.initializers.xavier_uniform(),
                            (hidden, c))
            b1m = self.param("mlp_fc1_bias", nn.initializers.zeros, (hidden,))
            w2 = self.param("mlp_fc2_weight", nn.initializers.xavier_uniform(),
                            (c, hidden))
            b2m = self.param("mlp_fc2_bias", nn.initializers.zeros, (c,))
            from ..ops.swin_attention_pallas import fused_swin_block_mlp
            return fused_swin_block_mlp(y, g2, b2, w1, b1m, w2, b2m, rows=w)

        shortcut = x
        y = LayerNorm(c, name="norm1")(x)
        if (hp, wp) != (h, wd):
            valid = np.zeros((1, hp, wp, 1), np.float32)
            valid[:, :h, :wd] = 1.0
            y = y * jnp.asarray(valid, y.dtype)

        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(hp, wp, w, shift))
        else:
            mask = None

        y = WindowAttention(c, w, self.num_heads, dtype=self.dtype,
                            name="attn")(y, mask, train=train)

        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))

        def droppath(r, val):
            if not train or self.drop_path == 0.0:
                return val
            keep = 1.0 - self.drop_path
            m = jax.random.bernoulli(r, keep, (b, 1, 1, 1)).astype(val.dtype)
            return val * m / keep

        if train and self.drop_path > 0.0:
            y = droppath(self.make_rng("droppath"), y)
        x = shortcut + y

        z = LayerNorm(c, name="norm2")(x)
        hidden = int(c * self.mlp_ratio)
        w1 = self.param("mlp_fc1_weight", nn.initializers.xavier_uniform(), (hidden, c))
        b1 = self.param("mlp_fc1_bias", nn.initializers.zeros, (hidden,))
        w2 = self.param("mlp_fc2_weight", nn.initializers.xavier_uniform(), (c, hidden))
        b2 = self.param("mlp_fc2_bias", nn.initializers.zeros, (c,))
        z = nn.gelu(z @ w1.T.astype(z.dtype) + b1.astype(z.dtype), approximate=False)
        z = z @ w2.T.astype(z.dtype) + b2.astype(z.dtype)
        if train and self.drop_path > 0.0:
            z = droppath(self.make_rng("droppath"), z)
        return x + z


class PatchMerging(nn.Module):
    """2×2 concat → LN → Linear 4C→2C."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        hp, wp = x.shape[1], x.shape[2]
        x = x.reshape(b, hp // 2, 2, wp // 2, 2, c)
        # torch order: x0=(0::2,0::2), x1=(1::2,0::2), x2=(0::2,1::2), x3=(1::2,1::2)
        x = jnp.concatenate([x[:, :, 0, :, 0], x[:, :, 1, :, 0],
                             x[:, :, 0, :, 1], x[:, :, 1, :, 1]], axis=-1)
        x = LayerNorm(4 * c, name="norm")(x)
        wr = self.param("reduction_weight", nn.initializers.xavier_uniform(),
                        (2 * c, 4 * c))
        return x @ wr.T.astype(x.dtype)


class SwinTransformer(nn.Module):
    """4-stage Swin trunk emitting {swin0..swin3} (strides 4/8/16/32)."""

    embed_dim: int = 128
    depths: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (4, 8, 16, 32)
    window: int = 7
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.3
    out_indices: Sequence[int] = (0, 1, 2, 3)
    dtype: Any = jnp.bfloat16

    @classmethod
    def from_size(cls, size: str, out_indices=(0, 1, 2, 3), dtype=jnp.bfloat16):
        c = SWIN_SIZES[size]
        return cls(embed_dim=c["embed_dim"], depths=c["depths"],
                   num_heads=c["num_heads"], window=c["window"],
                   out_indices=out_indices, dtype=dtype)

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x [B, H, W, 3] → dict of NHWC stage outputs."""
        ed = self.embed_dim
        # patch embed: conv 4×4 stride 4 (torch layout) + LN.  Callers may
        # pass the W-pack-4 view [B, H, W/4, 12] (DiffusionDetArch.
        # normalize does): the 4×4/s4 conv aligns exactly with the packing
        # — one pixel group per output column — so it becomes a (4, 1)/s
        # (4, 1) conv over 12 channels with identical arithmetic and 4×
        # the stem lane utilization.  The parameter keeps the torch
        # [ed, 3, 4, 4] layout either way.
        wpe = self.param("patch_embed_weight",
                         nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
                         (ed, 3, 4, 4))
        bpe = self.param("patch_embed_bias", nn.initializers.zeros, (ed,))
        if x.shape[-1] == 12:
            # [ky, kx, c, o] → [ky, 1, (kx·c)=12, o]; (kx, c) adjacent
            # matches the input's (px, c) packing
            kp = jnp.transpose(wpe, (2, 3, 1, 0)).reshape(4, 1, 12, ed)
            x = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kp.astype(self.dtype),
                (4, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            x = jax.lax.conv_general_dilated(
                x.astype(self.dtype), jnp.transpose(wpe, (2, 3, 1, 0)).astype(self.dtype),
                (4, 4), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = x + bpe.astype(self.dtype)
        x = LayerNorm(ed, name="patch_norm")(x)

        total = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total)
        outs = {}
        blk = 0
        w = self.window
        for s, depth in enumerate(self.depths):
            dim = ed * (2 ** s)
            h, wd = x.shape[1], x.shape[2]
            hp, wp = -(-h // w) * w, -(-wd // w) * w
            if (hp, wp) != (h, wd):        # pad ONCE per stage, not per block
                x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - wd), (0, 0)))
            for i in range(depth):
                x = SwinBlock(dim, self.num_heads[s], self.window,
                              shift=0 if i % 2 == 0 else self.window // 2,
                              mlp_ratio=self.mlp_ratio,
                              drop_path=float(dpr[blk]), dtype=self.dtype,
                              name=f"layers{s}.blocks{i}")(
                                  x, orig_hw=(h, wd), train=train)
                blk += 1
            if (hp, wp) != (h, wd):
                x = x[:, :h, :wd]
            if s in self.out_indices:
                outs[f"swin{s}"] = LayerNorm(dim, name=f"norm{s}")(x)
            if s < len(self.depths) - 1:
                x = PatchMerging(dim, dtype=self.dtype,
                                 name=f"layers{s}.downsample")(x)
        return outs


SWIN_FEATURE_STRIDES = {"swin0": 4, "swin1": 8, "swin2": 16, "swin3": 32}
