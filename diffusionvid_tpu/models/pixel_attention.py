"""Pixel-level temporal attention — the reference's prototype subsystems.

Two pieces, both unused by shipped headline configs but present in the
reference tree (SURVEY.md §5.7 names them explicitly):

  * ``PixelMemoryAttention`` — ``update_lm_pixel``
    (roi_box_feature_extractors.py:1214-1236): feature-map pixels attend
    over a pixel memory (self pixels + an irregular/distinct pixel cache)
    with geometry-free grouped relation attention, residual add.  Used by
    the PIXEL_ATTEND config flags.
  * ``SparseSpatioTemporalAttention`` — ``sparse_attn``
    (box_head.py:742-805): MHA over the flattened (frame, pixel) sequence
    of a coarse FPN level with a block mask = random ∪ same-position ∪
    same-frame — the blockwise sparse spatio-temporal pattern.

TPU notes: masks are built with iota/hash algebra at trace time (static
shapes, no host RNG at inference), the attention itself is ordinary
batched MXU matmuls with additive -inf masking.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

import math

from .heads import Linear, MultiheadAttention
from .relation import RelationAttention


def pixel_positional_embedding(height: int, width: int, d_model: int,
                               dtype=jnp.float32) -> jnp.ndarray:
    """2D sinusoidal positional embedding for feature-map pixels
    (``cal_positional_embedding_pixel``,
    roi_box_feature_extractors.py:257-279): the first half of the
    channels encodes the x (width) position, the second half the y
    (height) position, each as interleaved sin/cos.  The reference emits
    [1, C, H, W]; this returns the same values in NHWC [H, W, C]."""
    if d_model % 4 != 0:
        raise ValueError(f"d_model must be divisible by 4, got {d_model}")
    half = d_model // 2
    div = jnp.exp(jnp.arange(0, half, 2, dtype=jnp.float32)
                  * (-math.log(10000.0) / half))            # [half/2]
    pw = jnp.arange(width, dtype=jnp.float32)[:, None] * div[None]   # [W, half/2]
    ph = jnp.arange(height, dtype=jnp.float32)[:, None] * div[None]  # [H, half/2]
    k = div.shape[0]
    pe = jnp.zeros((height, width, d_model), jnp.float32)
    pe = pe.at[:, :, 0:half:2].set(
        jnp.broadcast_to(jnp.sin(pw)[None], (height, width, k)))
    pe = pe.at[:, :, 1:half:2].set(
        jnp.broadcast_to(jnp.cos(pw)[None], (height, width, k)))
    pe = pe.at[:, :, half::2].set(
        jnp.broadcast_to(jnp.sin(ph)[:, None], (height, width, k)))
    pe = pe.at[:, :, half + 1::2].set(
        jnp.broadcast_to(jnp.cos(ph)[:, None], (height, width, k)))
    return pe.astype(dtype)


class PixelMemoryAttention(nn.Module):
    """update_lm_pixel: pixels → grouped relation attention over a pixel
    memory (no geometry), residual.  Operates on NHWC maps.

    ``groups=8`` matches the reference's ``groups_p``
    (roi_box_feature_extractors.py:787)."""

    feat_dim: int = 1024
    groups: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, memory: Optional[jnp.ndarray] = None,
                 memory_valid: Optional[jnp.ndarray] = None,
                 keys: Optional[jnp.ndarray] = None,
                 keys_valid: Optional[jnp.ndarray] = None):
        """feats [H, W, C] query map; ``keys`` [K, C] the base reference
        pixel set (``feats_ref``; None → self-attention over the query's
        own pixels, update_lm_pixel's ``feats_ref is None`` default);
        ``memory`` [M, C] extra pixel keys appended after the base set
        (pixels_irr / pixels_last_high / external memories).  Returns the
        enhanced [H, W, C] map (query + attention residual,
        roi_box_feature_extractors.py:1227)."""
        h, w, c = feats.shape
        px = feats.reshape(-1, c)                       # [H*W, C]
        if keys is None:
            keys = px
            valid = jnp.ones((px.shape[0],), bool)
        else:
            keys = keys.astype(px.dtype)
            valid = (keys_valid if keys_valid is not None
                     else jnp.ones((keys.shape[0],), bool))
        if memory is not None:
            keys = jnp.concatenate([keys, memory.astype(px.dtype)], 0)
            mvalid = (memory_valid if memory_valid is not None
                      else jnp.ones((memory.shape[0],), bool))
            valid = jnp.concatenate([valid, mvalid], 0)
        att = RelationAttention(self.feat_dim, self.groups,
                                dtype=self.dtype, name="attn")(
            px, keys, None, valid)
        return (px + att).reshape(h, w, c)


def sparse_block_mask(rng, spatial: int, frames: int,
                      random_keep: float = 0.1) -> jnp.ndarray:
    """[T*S, T*S] boolean attention mask = random(p) ∪ same-position ∪
    same-frame blocks (sparse_attn.make_positional_attention,
    box_head.py:763-781; their make_random_attention keeps entries with
    probability ``random_attention_probability``)."""
    n = spatial * frames
    rand = jax.random.uniform(rng, (n, n)) < random_keep
    pos = jnp.arange(n)
    same_position = (pos[:, None] % spatial) == (pos[None, :] % spatial)
    same_frame = (pos[:, None] // spatial) == (pos[None, :] // spatial)
    return rand | same_position | same_frame


class SparseSpatioTemporalAttention(nn.Module):
    """sparse_attn: masked MHA over (frame, pixel) tokens of one coarse
    FPN level + residual/LN/MLP/LN (box_head.py:783-805)."""

    d_model: int = 256
    nheads: int = 8
    random_keep: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, rng):
        """feats [T, H, W, C] (one level, T frames); rng drives the random
        component of the block mask.  Returns the enhanced [T, H, W, C]."""
        t, h, w, c = feats.shape
        s = h * w
        mask = sparse_block_mask(rng, s, t, self.random_keep)   # [TS, TS]

        src = feats.reshape(1, t * s, c)
        att = MultiheadAttention(self.d_model, self.nheads,
                                 dtype=self.dtype, name="attn")(
            src, src, src, attn_mask=mask[None])
        x = src + att
        x = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x)
        y = Linear(self.d_model * 4, dtype=self.dtype, name="mlp_fc1")(x)
        y = Linear(self.d_model, dtype=self.dtype, name="mlp_fc2")(nn.relu(y))
        x = x + y
        x = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x)
        return x.reshape(t, h, w, c).astype(feats.dtype)
