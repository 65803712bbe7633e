"""Pixel-level attention prototypes (models/pixel_attention.py):
update_lm_pixel-style memory attention + sparse_attn block masking."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusionvid_tpu.models.pixel_attention import (
    PixelMemoryAttention, SparseSpatioTemporalAttention, sparse_block_mask)


def test_pixel_memory_attention_shapes():
    m = PixelMemoryAttention(feat_dim=64, groups=4)
    feats = jnp.asarray(np.random.RandomState(0).randn(6, 8, 64), jnp.float32)
    mem = jnp.asarray(np.random.RandomState(1).randn(20, 64), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), feats, mem)
    out = m.apply(v, feats, mem)
    assert out.shape == feats.shape
    assert np.isfinite(np.asarray(out)).all()
    # residual structure: output differs from input (attention added)
    assert not np.allclose(np.asarray(out), np.asarray(feats))


def test_pixel_memory_attention_self_only():
    m = PixelMemoryAttention(feat_dim=64, groups=4)
    feats = jnp.asarray(np.random.RandomState(0).randn(4, 4, 64), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), feats, None)
    out = m.apply(v, feats, None)
    assert out.shape == feats.shape


def test_sparse_block_mask_structure():
    rng = jax.random.PRNGKey(0)
    s, t = 6, 3
    mask = np.asarray(sparse_block_mask(rng, s, t, random_keep=0.0))
    n = s * t
    assert mask.shape == (n, n)
    for i in range(n):
        for j in range(n):
            same_pos = (i % s) == (j % s)
            same_frame = (i // s) == (j // s)
            assert mask[i, j] == (same_pos or same_frame)
    # random component adds entries
    mask_r = np.asarray(sparse_block_mask(rng, s, t, random_keep=1.0))
    assert mask_r.all()


def test_sparse_spatiotemporal_attention():
    m = SparseSpatioTemporalAttention(d_model=32, nheads=4)
    feats = jnp.asarray(np.random.RandomState(0).randn(3, 4, 5, 32),
                        jnp.float32)
    rng = jax.random.PRNGKey(1)
    v = m.init(jax.random.PRNGKey(0), feats, rng)
    out = m.apply(v, feats, rng)
    assert out.shape == feats.shape
    assert np.isfinite(np.asarray(out)).all()
