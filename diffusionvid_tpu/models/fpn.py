"""Feature Pyramid Network (detectron2-style) in flax.linen, NHWC.

Replaces the reference's FPN module (``mega_core/modeling/backbone/fpn.py``)
and detectron2's ``build_resnet_fpn_backbone`` used by the flagship configs
(``configs/vid_R_101_DiffusionVID.yaml:5-16``: IN_FEATURES res3-res5 →
p3-p5, OUT_CHANNELS 256, sum fusion, LastLevelMaxPool p6).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvWB(nn.Module):
    """Conv with bias in torch layout (FPN lateral/output convs have bias)."""

    features: int
    kernel: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from .resnet import Conv
        return Conv(self.features, self.kernel, 1, self.kernel // 2,
                    use_bias=True, dtype=self.dtype)(x)


def _upsample_nearest_2x(x):
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


class FPN(nn.Module):
    """Top-down pyramid: lateral 1x1 + nearest-2x top-down sum + 3x3 output.

    ``in_features`` are backbone keys, finest first (e.g. res3, res4, res5);
    outputs ``p<level>`` with the same strides plus optional ``p_top`` from a
    stride-2 max-pool of the coarsest output (detectron2 LastLevelMaxPool).
    """

    in_features: Sequence[str] = ("res3", "res4", "res5")
    out_channels: int = 256
    top_block: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: dict) -> dict:
        import math
        from .resnet import RESNET_FEATURE_STRIDES

        xs = [feats[k] for k in self.in_features]  # finest → coarsest
        n = len(xs)
        laterals = [
            ConvWB(self.out_channels, 1, dtype=self.dtype, name=f"lateral{i}")(xs[i])
            for i in range(n)
        ]
        outs = [None] * n
        prev = laterals[-1]
        outs[-1] = ConvWB(self.out_channels, 3, dtype=self.dtype, name=f"output{n - 1}")(prev)
        for i in range(n - 2, -1, -1):
            up = _upsample_nearest_2x(prev)
            # Crop in case of odd input sizes (shapes are static).
            up = up[:, : laterals[i].shape[1], : laterals[i].shape[2], :]
            prev = laterals[i] + up
            outs[i] = ConvWB(self.out_channels, 3, dtype=self.dtype, name=f"output{i}")(prev)

        def stride_of(k):
            if k in RESNET_FEATURE_STRIDES:
                return RESNET_FEATURE_STRIDES[k]
            if k.startswith("swin"):
                return 4 * 2 ** int(k[4:])
            return 2 ** (int(k[-1]) + 1)

        strides = [stride_of(k) for k in self.in_features]
        levels = [int(math.log2(s)) for s in strides]
        result = {f"p{l}": o for l, o in zip(levels, outs)}
        if self.top_block:
            top = nn.max_pool(outs[-1], (1, 1), strides=(2, 2), padding="VALID")
            result[f"p{levels[-1] + 1}"] = top
        return result
