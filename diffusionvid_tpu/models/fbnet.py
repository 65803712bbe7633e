"""FBNet mobile backbone family (parity subtree).

Full re-design of the reference FBNet stack
(``mega_core/modeling/backbone/fbnet.py``, ``fbnet_builder.py:37-200``
PRIMITIVES + IRFBlock, ``fbnet_modeldef.py:11-230`` MODEL_ARCH +
MODEL_ARCH_CHAM): arch tables with per-block op types (ir_k1/k3/k5/k7,
skip, shuffle, optional squeeze-excite), per-stage ``[t, c, n, s]``
configs (negative stride = 2× upsample, ``_get_upsample_op``), and the
stage-role split (``backbone`` / ``rpn`` / ``bbox`` / ``mask``) that
carves one table into trunk + heads.  No VID config uses FBNet
(SURVEY.md §2.2) — shipped for component parity with shape tests.

TPU notes: depthwise convs map to ``feature_group_count``; channel
shuffle is a reshape-transpose; upsampling is ``jax.image.resize``;
everything is NHWC with static shapes.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from .resnet import FrozenBatchNorm

# arch tables (fbnet_modeldef.py — published architecture constants).
# Each stage: list of [t, c, n, s]; ops: per-stage list of per-block op
# names (expanded over the n repeats, reference expand_block_cfg).
FBNET_ARCHS = {
    "default": dict(
        first=(32, 2),
        stages=[
            [[1, 16, 1, 1]],
            [[6, 24, 2, 2]],
            [[6, 32, 3, 2]],
            [[6, 64, 4, 2], [6, 96, 3, 1]],
            [[4, 160, 1, 2], [6, 160, 2, 1], [6, 240, 1, 1]],   # bbox
            [[6, 96, 3, 1]],                                    # rpn
            [[4, 160, 1, 1], [6, 160, 3, 1], [3, 80, 1, -2]],   # mask
        ],
        ops=[["ir_k3"], ["ir_k3"] * 2, ["ir_k3"] * 3, ["ir_k3"] * 7,
             ["ir_k3"] * 4, ["ir_k3"] * 3, ["ir_k3"] * 5],
        backbone=[0, 1, 2, 3], rpn=[5], bbox=[4], mask=[6],
    ),
    "xirb16d_dsmask": dict(
        first=(16, 2),
        stages=[
            [[1, 16, 1, 1]],
            [[6, 32, 2, 2]],
            [[6, 48, 3, 2]],
            [[6, 96, 4, 2], [6, 128, 3, 1]],
            [[4, 128, 1, 2], [6, 128, 2, 1], [6, 160, 1, 1]],   # bbox
            [[4, 128, 1, 2], [6, 128, 2, 1], [6, 128, 1, -2],
             [3, 64, 1, -2]],                                   # mask
            [[6, 128, 3, 1]],                                   # rpn
        ],
        ops=[["ir_k3"], ["ir_k3"] * 2, ["ir_k3"] * 3, ["ir_k3"] * 7,
             ["ir_k3"] * 4, ["ir_k3"] * 5, ["ir_k3"] * 3],
        backbone=[0, 1, 2, 3], rpn=[6], bbox=[4], mask=[5],
    ),
    "mobilenet_v2": dict(
        first=(32, 2),
        stages=[
            [[1, 16, 1, 1]],
            [[6, 24, 2, 2]],
            [[6, 32, 3, 2]],
            [[6, 64, 4, 2], [6, 96, 3, 1]],
            [[6, 160, 3, 1], [6, 320, 1, 1]],                   # bbox
        ],
        ops=[["ir_k3"], ["ir_k3"] * 2, ["ir_k3"] * 3, ["ir_k3"] * 7,
             ["ir_k3"] * 4],
        backbone=[0, 1, 2, 3], rpn=[], bbox=[4], mask=[],
    ),
    "cham_v1a": dict(
        first=(32, 2),
        stages=[
            [[1, 24, 1, 1]],
            [[4, 48, 2, 2]],
            [[7, 64, 5, 2]],
            [[12, 56, 7, 2], [8, 88, 5, 1]],
            [[7, 152, 4, 2], [10, 104, 1, 1]],                  # bbox
            [[8, 88, 3, 1]],                                    # rpn
        ],
        ops=[["ir_k3"], ["ir_k7"] * 2, ["ir_k3"] * 5,
             ["ir_k5"] * 7 + ["ir_k3"] * 5, ["ir_k3"] * 5, ["ir_k3"] * 3],
        backbone=[0, 1, 2, 3], rpn=[5], bbox=[4], mask=[],
    ),
    "cham_v2": dict(
        first=(32, 2),
        stages=[
            [[1, 24, 1, 1]],
            [[8, 32, 4, 2]],
            [[5, 48, 6, 2]],
            [[9, 56, 3, 2], [6, 56, 6, 1]],
            [[2, 160, 6, 2], [6, 112, 1, 1]],                   # bbox
            [[6, 56, 1, 1]],                                    # rpn
        ],
        ops=[["ir_k3"], ["ir_k5"] * 4, ["ir_k7"] * 6,
             ["ir_k5"] * 3 + ["ir_k3"] * 6, ["ir_k3"] * 7, ["ir_k3"]],
        backbone=[0, 1, 2, 3], rpn=[5], bbox=[4], mask=[],
    ),
}

# op name → (kernel, shuffle pw_group, squeeze-excite)
# (fbnet_builder.py PRIMITIVES; "skip" handled separately)
_OP_TABLE = {
    "ir_k1": dict(kernel=1),
    "ir_k3": dict(kernel=3),
    "ir_k5": dict(kernel=5),
    "ir_k7": dict(kernel=7),
    "ir_k3_se": dict(kernel=3, se=True),
    "ir_k5_se": dict(kernel=5, se=True),
    "shuffle": dict(kernel=3, pw_group=4, shuffle=True),
    "skip": dict(skip=True),
}


def _expand_blocks(stage_cfgs, stage_ops):
    """[t,c,n,s] × op lists → flat [(op, t, c, stride)] (reference
    expand_block_cfg: the first repeat takes the stride, later ones 1;
    negative stride s → one upsample(|s|) block then stride 1)."""
    out = []
    i = 0
    for t, c, n, s in stage_cfgs:
        for r in range(n):
            op = stage_ops[min(i, len(stage_ops) - 1)]
            out.append((op, t, c, s if r == 0 else 1))
            i += 1
    return out


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


class SqueezeExcite(nn.Module):
    """SEModule (fbnet_builder.py:220-250): GAP → fc/4 → relu → fc → sigmoid
    gate."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = max(self.channels // 4, 4)
        s = x.mean(axis=(1, 2))
        s = nn.relu(nn.Dense(mid, dtype=self.dtype, name="fc1")(s))
        s = jax.nn.sigmoid(nn.Dense(self.channels, dtype=self.dtype,
                                    name="fc2")(s))
        return x * s[:, None, None, :]


def _channel_shuffle(x, groups: int):
    """ChannelShuffle (fbnet_builder.py:205-218): [.., g, c/g] transpose."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    return x.transpose(0, 1, 2, 4, 3).reshape(b, h, w, c)


class InvertedResidual(nn.Module):
    """IRFBlock (fbnet_builder.py:445-560): 1×1 expand (optionally grouped
    + mid channel-shuffle) → k×k depthwise (stride, or 2× upsample for
    negative strides) → 1×1 project; residual when shapes match;
    optional squeeze-excite after the depthwise."""

    features: int
    expansion: int
    kernel: int = 3
    stride: int = 1
    pw_group: int = 1
    shuffle: bool = False
    se: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        mid = in_ch * self.expansion
        stride = self.stride
        y = x
        if self.expansion != 1:
            y = ConvBNRelu(mid, 1, groups=self.pw_group, dtype=self.dtype,
                           name="pw")(y)
        if self.shuffle and self.pw_group > 1:
            y = _channel_shuffle(y, self.pw_group)
        if stride < 0:          # _get_upsample_op: upsample then stride 1
            b, h, w, c = y.shape
            y = jax.image.resize(y.astype(jnp.float32),
                                 (b, h * (-stride), w * (-stride), c),
                                 "nearest").astype(y.dtype)
            stride = 1
        if self.kernel > 1:
            y = ConvBNRelu(mid, self.kernel, stride, groups=mid,
                           dtype=self.dtype, name="dw")(y)
        if self.se:
            y = SqueezeExcite(mid, dtype=self.dtype, name="se")(y)
        y = ConvBNRelu(self.features, 1, groups=self.pw_group, relu=False,
                       dtype=self.dtype, name="pwl")(y)
        if self.stride == 1 and in_ch == self.features:
            y = y + x
        return y


class _Stages(nn.Module):
    """A run of expanded blocks (shared by trunk and head modules)."""

    blocks: Sequence  # [(op, t, c, stride)]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for bi, (op, t, c, s) in enumerate(self.blocks):
            spec = _OP_TABLE[op]
            if spec.get("skip"):
                if x.shape[-1] != c or s != 1:
                    x = ConvBNRelu(c, 1, max(s, 1), dtype=self.dtype,
                                   name=f"block{bi}")(x)
                continue
            x = InvertedResidual(
                c, t, spec.get("kernel", 3), s,
                pw_group=spec.get("pw_group", 1),
                shuffle=spec.get("shuffle", False),
                se=spec.get("se", False),
                dtype=self.dtype, name=f"block{bi}")(x)
        return x


def _role_blocks(arch: str, role: str):
    a = FBNET_ARCHS[arch]
    blocks = []
    for si in a[role]:
        blocks.extend(_expand_blocks(a["stages"][si], a["ops"][si]))
    return blocks


class FBNetTrunk(nn.Module):
    """Backbone trunk: first conv + the arch's ``backbone`` stages
    (fbnet.py FBNetTrunk)."""

    arch: str = "default"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c0, s0 = FBNET_ARCHS[self.arch]["first"]
        x = ConvBNRelu(c0, 3, s0, dtype=self.dtype, name="first")(x)
        return _Stages(tuple(_role_blocks(self.arch, "backbone")),
                       dtype=self.dtype, name="stages")(x)

    @property
    def out_channels(self):
        return _role_blocks(self.arch, "backbone")[-1][2]


class FBNetBoxHead(nn.Module):
    """The arch's ``bbox`` stages + average pool (fbnet.py FBNetROIHead)."""

    arch: str = "default"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _Stages(tuple(_role_blocks(self.arch, "bbox")),
                    dtype=self.dtype, name="stages")(x)
        return x.mean(axis=(1, 2))

    @property
    def out_channels(self):
        return _role_blocks(self.arch, "bbox")[-1][2]


class FBNetRPNHead(nn.Module):
    """The arch's ``rpn`` stages (fbnet.py FBNetRPNHead feature tower)."""

    arch: str = "default"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return _Stages(tuple(_role_blocks(self.arch, "rpn")),
                       dtype=self.dtype, name="stages")(x)


class FBNetMaskHead(nn.Module):
    """The arch's ``mask`` stages (upsampling blocks included)."""

    arch: str = "default"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return _Stages(tuple(_role_blocks(self.arch, "mask")),
                       dtype=self.dtype, name="stages")(x)
