"""FlowNetS + feature warping for the DFF/FGFA paths.

Re-design of ``mega_core/modeling/backbone/flownet.py:14-121`` (FlowNetS
encoder/decoder with multi-scale flow refinement, LeakyReLU 0.1, input/
output avg-pools, flow scaled ×2.5, plus the DFF per-channel scale map)
and the flow-guided warping the reference does with grid_sample — here a
pure-jnp bilinear ``warp_features``.
NHWC layout; transposed convs via lax.conv_transpose.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import Conv


class Deconv(nn.Module):
    """ConvTranspose2d k4 s2 in torch layout (weight [in, out, 4, 4])."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        w = self.param("weight", nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
                       (in_ch, self.features, 4, 4))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jax.lax.conv_transpose(
            x.astype(self.dtype), jnp.transpose(w, (2, 3, 0, 1)).astype(self.dtype),
            strides=(2, 2), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b.astype(self.dtype)


def _crop_like(x, ref):
    """Match the reference's crop (flownet.py:7-11): drop 1px border to the
    target size after a VALID k4s2 deconv (out = 2*in + 2)."""
    if x.shape[1:3] == ref.shape[1:3]:
        return x
    return x[:, 1: ref.shape[1] + 1, 1: ref.shape[2] + 1, :]


def _avgpool2(x):
    """2×2 stride-2 average pool, ceil-mode via edge padding."""
    ph, pw = x.shape[1] % 2, x.shape[2] % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    return nn.avg_pool(x, (2, 2), strides=(2, 2), padding="VALID")


class FlowNetS(nn.Module):
    """Flow between two images (stacked 6-channel input, half resolution).

    Returns flow at 1/16 input resolution ×2.5 (matching the backbone's
    res4 stride), plus the DFF scale map when ``predict_scale``.
    """

    predict_scale: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img_pair):
        lrelu = lambda v: nn.leaky_relu(v, 0.1)
        x = _avgpool2(img_pair)

        c1 = lrelu(Conv(64, 7, 2, 3, True, self.dtype, name="flow_conv1")(x))
        c2 = lrelu(Conv(128, 5, 2, 2, True, self.dtype, name="conv2")(c1))
        c3 = lrelu(Conv(256, 5, 2, 2, True, self.dtype, name="conv3")(c2))
        c3_1 = lrelu(Conv(256, 3, 1, 1, True, self.dtype, name="conv3_1")(c3))
        c4 = lrelu(Conv(512, 3, 2, 1, True, self.dtype, name="conv4")(c3_1))
        c4_1 = lrelu(Conv(512, 3, 1, 1, True, self.dtype, name="conv4_1")(c4))
        c5 = lrelu(Conv(512, 3, 2, 1, True, self.dtype, name="conv5")(c4_1))
        c5_1 = lrelu(Conv(512, 3, 1, 1, True, self.dtype, name="conv5_1")(c5))
        c6 = lrelu(Conv(1024, 3, 2, 1, True, self.dtype, name="conv6")(c5))
        c6_1 = lrelu(Conv(1024, 3, 1, 1, True, self.dtype, name="conv6_1")(c6))

        flow6 = Conv(2, 3, 1, 1, True, self.dtype, name="Convolution1")(c6_1)
        up_f65 = _crop_like(Deconv(2, self.dtype, name="upsample_flow6to5")(flow6), c5_1)
        d5 = lrelu(_crop_like(Deconv(512, self.dtype, name="deconv5")(c6_1), c5_1))
        cat2 = jnp.concatenate([c5_1, d5, up_f65], -1)

        flow5 = Conv(2, 3, 1, 1, True, self.dtype, name="Convolution2")(cat2)
        up_f54 = _crop_like(Deconv(2, self.dtype, name="upsample_flow5to4")(flow5), c4_1)
        d4 = lrelu(_crop_like(Deconv(256, self.dtype, name="deconv4")(cat2), c4_1))
        cat3 = jnp.concatenate([c4_1, d4, up_f54], -1)

        flow4 = Conv(2, 3, 1, 1, True, self.dtype, name="Convolution3")(cat3)
        up_f43 = _crop_like(Deconv(2, self.dtype, name="upsample_flow4to3")(flow4), c3_1)
        d3 = lrelu(_crop_like(Deconv(128, self.dtype, name="deconv3")(cat3), c3_1))
        cat4 = jnp.concatenate([c3_1, d3, up_f43], -1)

        flow3 = Conv(2, 3, 1, 1, True, self.dtype, name="Convolution4")(cat4)
        up_f32 = _crop_like(Deconv(2, self.dtype, name="upsample_flow3to2")(flow3), c2)
        d2 = lrelu(_crop_like(Deconv(64, self.dtype, name="deconv2")(cat4), c2))
        cat5 = jnp.concatenate([c2, d2, up_f32], -1)
        cat5 = _avgpool2(cat5)

        flow = Conv(2, 3, 1, 1, True, self.dtype, name="Convolution5")(cat5) * 2.5
        if self.predict_scale:
            scale = Conv(1024, 1, 1, 0, False, self.dtype,
                         name="Convolution5_scale")(cat5) + 1.0
            return flow, scale
        return flow


def grid_sample_bilinear(feat, coords_y, coords_x):
    """Bilinear sampling with zero padding outside.

    feat [B,H,W,C]; coords in pixel units, same spatial shape per batch."""
    b, h, w, c = feat.shape
    y0 = jnp.floor(coords_y)
    x0 = jnp.floor(coords_x)
    ly = coords_y - y0
    lx = coords_x - x0

    def gather(yy, xx):
        ok = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        yc = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        flat = feat.reshape(b, h * w, c)
        idx = (yc * w + xc).reshape(b, -1)
        g = jnp.take_along_axis(flat, idx[..., None], axis=1)
        g = g.reshape(*yy.shape, c)
        return g * ok[..., None].astype(feat.dtype)

    out = (gather(y0, x0) * ((1 - ly) * (1 - lx))[..., None]
           + gather(y0, x0 + 1) * ((1 - ly) * lx)[..., None]
           + gather(y0 + 1, x0) * (ly * (1 - lx))[..., None]
           + gather(y0 + 1, x0 + 1) * (ly * lx)[..., None])
    return out


def warp_features(feat, flow):
    """Warp features by flow (DFF/FGFA flow-guided warping).

    feat [B,H,W,C]; flow [B,H,W,2] in (dx, dy) feature-pixel units: output
    at (y, x) samples input at (y + dy, x + dx)."""
    b, h, w, _ = flow.shape
    yy = jnp.arange(h)[None, :, None] + flow[..., 1]
    xx = jnp.arange(w)[None, None, :] + flow[..., 0]
    yy = jnp.broadcast_to(yy, (b, h, w))
    xx = jnp.broadcast_to(xx, (b, h, w))
    return grid_sample_bilinear(feat, yy, xx)


class EmbedNet(nn.Module):
    """FGFA cosine-similarity embedding (embednet.py:8-27)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(Conv(512, 1, 1, 0, True, self.dtype, name="embed_conv1")(x))
        x = nn.relu(Conv(512, 3, 1, 1, True, self.dtype, name="embed_conv2")(x))
        return Conv(2048, 1, 1, 0, True, self.dtype, name="embed_conv3")(x)
