"""ResNet backbone (torchvision-style) in flax.linen, NHWC, FrozenBN.

Functional replacement for the reference backbones: the mega_core ResNet
(``mega_core/modeling/backbone/resnet.py:81-352``) and the detectron2
``build_resnet_backbone`` used by the DiffusionDet path
(``diffusion_det.py:151-165``: depth 101, FrozenBN, STRIDE_IN_1X1=False i.e.
torchvision bottlenecks, OUT_FEATURES res2..res5, FREEZE_AT=2).

TPU-first choices:
  * NHWC layout — channels ride the 128-lane axis, convs tile onto the MXU;
  * FrozenBN folded to a fused scale/bias (XLA constant-folds it into the
    preceding conv);
  * compute dtype is configurable (bfloat16 by default), params stay fp32;
  * parameter names mirror the torch checkpoint layout (conv1/bn1/...,
    layerN.M.convK) so released weights port with a mechanical name map.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

Dtype = Any

# depth → blocks per stage
RESNET_STAGES = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


class FrozenBatchNorm(nn.Module):
    """BatchNorm with statically-frozen statistics (reference:
    ``mega_core/layers/batch_norm.py`` FrozenBatchNorm2d; detectron2 eps 1e-5).

    Stored in torch layout (weight/bias/running_mean/running_var) so torch
    checkpoints map 1:1; folded to one multiply-add at trace time.
    """

    features: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = self.features
        gamma = self.param("weight", nn.initializers.ones, (f,))
        beta = self.param("bias", nn.initializers.zeros, (f,))
        mean = self.param("running_mean", nn.initializers.zeros, (f,))
        var = self.param("running_var", nn.initializers.ones, (f,))
        scale = gamma * lax.rsqrt(var + self.eps)
        shift = beta - mean * scale
        return x * scale.astype(self.dtype) + shift.astype(self.dtype)


class Conv(nn.Module):
    """Conv2D in torch weight layout ([out, in, kh, kw]) for easy porting."""

    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = False
    dtype: Dtype = jnp.float32
    dilation: int = 1      # kept last: callers pass dtype positionally
    groups: int = 1        # ResNeXt grouped conv (NUM_GROUPS)

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel
        w = self.param("weight", nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
                       (self.features, in_ch // self.groups, k, k))
        # torch OIHW → lax HWIO
        w_hwio = jnp.transpose(w, (2, 3, 1, 0)).astype(self.dtype)
        y = lax.conv_general_dilated(
            x.astype(self.dtype), w_hwio,
            window_strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            rhs_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(self.dtype)
        return y


class StemConv(nn.Module):
    """The 7×7/s2 stem conv, computed via W-only space-to-depth.

    A C_in=3 convolution uses 3/128 MXU lanes.  Equivalent form (the
    MLPerf ResNet trick, W axis only): zero-pad the kernel's W taps
    -3..3 → -4..3 and view it as a 7×4 conv over the [B, H, W/2, 2·C]
    input — the W regroup is a FREE reshape (the (w, c) pair is already
    adjacent in memory; no transpose, no strided slice), while the H
    stride-2 stays in the conv, which XLA handles natively.  Identical
    arithmetic, 2× better lane utilisation than direct, and — unlike the
    full 2×2 space-to-depth, which needs a 6D reshape-transpose that XLA
    materialises as HBM relayout copies — zero data movement.  The
    parameter keeps the torch [64, 3, 7, 7] layout so checkpoints load
    unchanged.
    """

    features: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, cpacked = x.shape
        cin = 3 if cpacked == 6 else cpacked
        kw = self.param(
            "weight",
            nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            (self.features, cin, 7, 7))
        if cpacked != 6 and (h % 2 or w % 2):   # odd extents: direct form
            w_hwio = jnp.transpose(kw, (2, 3, 1, 0)).astype(self.dtype)
            return lax.conv_general_dilated(
                x.astype(self.dtype), w_hwio, (2, 2), [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # W-only space-to-depth: [B, H, W/2, (px, c)] — a FREE view (the
        # (w, c) pair is already adjacent in memory; no transpose, no
        # strided slice).  The H stride stays in the conv, which XLA
        # handles natively.  Callers may pass the packed [B, H, W/2, 6]
        # form directly (DiffusionDetArch.normalize does, so the packing
        # fuses into the normalize pass instead of a separate relayout
        # copy); the parameter keeps the torch [64, 3, 7, 7] layout
        # either way.
        x2 = x if cpacked == 6 else x.reshape(b, h, w // 2, 2 * cin)
        # kernel: zero-pad W taps -3..3 → -4..3, split 8 = 2·kx + px
        k8 = jnp.pad(kw, ((0, 0), (0, 0), (0, 0), (1, 0)))
        k2 = k8.reshape(self.features, cin, 7, 4, 2)
        # dims [out, c, ky, kx, px] → [ky, kx, (px, c), out]
        k2 = k2.transpose(2, 3, 4, 1, 0).reshape(7, 4, 2 * cin,
                                                 self.features)
        # y[o] = Σ_u x[2o+u-4]·k8[u], u = 2·kx+px → x_px[o+kx-2]: pad (2,1)
        return lax.conv_general_dilated(
            x2.astype(self.dtype), k2.astype(self.dtype), (2, 1),
            [(3, 3), (2, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))


class Bottleneck(nn.Module):
    """torchvision bottleneck: 1x1 → 3x3(stride) → 1x1, FrozenBN, ReLU."""

    mid: int
    out: int
    stride: int = 1
    dilation: int = 1
    has_shortcut: bool = False
    groups: int = 1        # ResNeXt cardinality (NUM_GROUPS)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # dilation>1 resets the stride to 1 (maskrcnn-benchmark
        # Bottleneck.__init__: "if dilation > 1: stride = 1")
        stride = 1 if self.dilation > 1 else self.stride
        identity = x
        y = Conv(self.mid, 1, 1, 0, dtype=self.dtype, name="conv1")(x)
        y = FrozenBatchNorm(self.mid, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = Conv(self.mid, 3, stride, self.dilation,
                 dilation=self.dilation, groups=self.groups,
                 dtype=self.dtype, name="conv2")(y)
        y = FrozenBatchNorm(self.mid, dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = Conv(self.out, 1, 1, 0, dtype=self.dtype, name="conv3")(y)
        y = FrozenBatchNorm(self.out, dtype=self.dtype, name="bn3")(y)
        if self.has_shortcut:
            identity = Conv(self.out, 1, stride, 0, dtype=self.dtype, name="downsample_conv")(x)
            identity = FrozenBatchNorm(self.out, dtype=self.dtype, name="downsample_bn")(identity)
        return nn.relu(y + identity)


class ResNet(nn.Module):
    """ResNet-C5 trunk emitting a {res2..res5} feature dict.

    ``out_features`` picks which stages to return; strides are 4/8/16/32.
    """

    depth: int = 101
    out_features: Sequence[str] = ("res3", "res4", "res5")
    num_groups: int = 1          # ResNeXt: NUM_GROUPS (e.g. 64)
    width_per_group: int = 64    # ResNeXt: WIDTH_PER_GROUP (e.g. 4)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        blocks = RESNET_STAGES[self.depth]
        x = StemConv(64, dtype=self.dtype, name="conv1")(x)
        x = FrozenBatchNorm(64, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        # torch maxpool k3 s2 p1
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats = {}
        out_ch = 256
        # ResNeXt widens the bottleneck: mid = groups * width_per_group
        # per stage (maskrcnn resnet.py stage2_bottleneck_channels scaling)
        mid = self.num_groups * self.width_per_group \
            if self.num_groups > 1 else 64
        max_stage = max(int(k[-1]) for k in self.out_features)  # res<k>
        for stage_idx, n_blocks in enumerate(blocks):
            if stage_idx + 2 > max_stage:
                break
            stride = 1 if stage_idx == 0 else 2
            for b in range(n_blocks):
                x = Bottleneck(
                    mid=mid, out=out_ch,
                    stride=stride if b == 0 else 1,
                    has_shortcut=(b == 0),
                    groups=self.num_groups,
                    dtype=self.dtype,
                    name=f"layer{stage_idx + 1}.{b}",
                )(x)
            feats[f"res{stage_idx + 2}"] = x
            mid *= 2
            out_ch *= 2
        return {k: feats[k] for k in self.out_features}


class ResNetStage(nn.Module):
    """One standalone ResNet stage — used as the C4 architecture's res5 box
    head (reference: ResNetHead, backbone/resnet.py:183-226, applied to
    pooled 14×14 features with stride 2)."""

    depth: int = 101
    stage: int = 5
    stride: int = 2
    dilation: int = 1      # RES5_DILATION (dilation>1 → stride 1)
    num_groups: int = 1
    width_per_group: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n_blocks = RESNET_STAGES[self.depth][self.stage - 2]
        base = (self.num_groups * self.width_per_group
                if self.num_groups > 1 else 64)
        mid = base * (2 ** (self.stage - 2))
        out_ch = 256 * (2 ** (self.stage - 2))
        for b in range(n_blocks):
            x = Bottleneck(
                mid=mid, out=out_ch,
                stride=self.stride if b == 0 else 1,
                dilation=self.dilation,
                has_shortcut=(b == 0),
                groups=self.num_groups,
                dtype=self.dtype,
                name=f"layer{self.stage - 1}.{b}",
            )(x)
        return x


RESNET_FEATURE_CHANNELS = {"res2": 256, "res3": 512, "res4": 1024, "res5": 2048}
RESNET_FEATURE_STRIDES = {"res2": 4, "res3": 8, "res4": 16, "res5": 32}
