"""FBNet mobile backbone family (parity subtree).

Compact re-design of the reference FBNet stack
(``mega_core/modeling/backbone/fbnet.py``, ``fbnet_builder.py``,
``fbnet_modeldef.py``): a MobileNetV2-style trunk of inverted-residual
(``ir_k3``/``ir_k5``) blocks described by ``[expansion t, channels c,
repeat n, stride s]`` stage tables, BN(frozen at inference)+ReLU, plus the
detection-head stage used as the FBNet ROI box head.  No VID config uses
FBNet (SURVEY.md §2.2 "unused by VID configs") — shipped for component
parity with a shape test.

TPU notes: depthwise convs map to ``feature_group_count``; everything is
NHWC with static shapes.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from .resnet import FrozenBatchNorm

# arch name → (first [c, s], trunk stages [[t, c, n, s], ...], kernel)
# (fbnet_modeldef.py "default" trunk stages 0-3; "cham_a"-style wide variant)
FBNET_ARCHS = {
    "default": (
        (32, 2),
        [[1, 16, 1, 1], [6, 24, 2, 2], [6, 32, 3, 2],
         [6, 64, 4, 2], [6, 96, 3, 1]],
        3,
    ),
    "mobilenet_v2": (
        (32, 2),
        [[1, 16, 1, 1], [6, 24, 2, 2], [6, 32, 3, 2],
         [6, 64, 4, 2], [6, 96, 3, 1], [6, 160, 3, 2]],
        3,
    ),
}

# FBNet detection head stage ("default" stage 4: [[4,160,1,2],[6,160,2,1],
# [6,240,1,1]])
FBNET_HEAD_STAGE = [[4, 160, 1, 2], [6, 160, 2, 1], [6, 240, 1, 1]]


class ConvBNRelu(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel
        w = self.param("weight",
                       nn.initializers.variance_scaling(2.0, "fan_out",
                                                        "truncated_normal"),
                       (self.features, in_ch // self.groups, k, k))
        w_hwio = jnp.transpose(w, (2, 3, 1, 0)).astype(self.dtype)
        y = lax.conv_general_dilated(
            x.astype(self.dtype), w_hwio,
            window_strides=(self.stride, self.stride),
            padding=[(k // 2, k // 2)] * 2,
            feature_group_count=self.groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = FrozenBatchNorm(self.features, dtype=self.dtype, name="bn")(y)
        return nn.relu(y) if self.relu else y


class InvertedResidual(nn.Module):
    """ir_k{3,5} (fbnet_builder.py IRFBlock): 1×1 expand → k×k depthwise
    (stride) → 1×1 project, residual when shapes match."""

    features: int
    expansion: int
    kernel: int = 3
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        mid = in_ch * self.expansion
        y = x
        if self.expansion != 1:
            y = ConvBNRelu(mid, 1, dtype=self.dtype, name="pw")(y)
        y = ConvBNRelu(mid, self.kernel, self.stride, groups=mid,
                       dtype=self.dtype, name="dw")(y)
        y = ConvBNRelu(self.features, 1, relu=False, dtype=self.dtype,
                       name="pwl")(y)
        if self.stride == 1 and in_ch == self.features:
            y = y + x
        return y


class FBNetTrunk(nn.Module):
    """Backbone trunk: first conv + inverted-residual stages.  Emits the
    final trunk feature map (the reference's single-level FBNet backbone,
    fbnet.py FBNetTrunk)."""

    arch: str = "default"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        (c0, s0), stages, k = FBNET_ARCHS[self.arch]
        x = ConvBNRelu(c0, 3, s0, dtype=self.dtype, name="first")(x)
        bi = 0
        for t, c, n, s in stages:
            for i in range(n):
                x = InvertedResidual(c, t, k, s if i == 0 else 1,
                                     dtype=self.dtype, name=f"block{bi}")(x)
                bi += 1
        return x

    @property
    def out_channels(self):
        return FBNET_ARCHS[self.arch][1][-1][1]


class FBNetBoxHead(nn.Module):
    """The FBNet ROI box-head stage (modeldef stage 4) + average pool."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        bi = 0
        for t, c, n, s in FBNET_HEAD_STAGE:
            for i in range(n):
                x = InvertedResidual(c, t, 3, s if i == 0 else 1,
                                     dtype=self.dtype, name=f"block{bi}")(x)
                bi += 1
        return x.mean(axis=(1, 2))
