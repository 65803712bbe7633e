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


def test_pixel_positional_embedding_golden():
    """cal_positional_embedding_pixel (roi_box_feature_extractors.py:
    257-279) in NHWC: first channel half encodes x (width), second half
    y (height), interleaved sin/cos."""
    import math
    from diffusionvid_tpu.models.pixel_attention import (
        pixel_positional_embedding)
    h, w, c = 3, 5, 16
    pe = np.asarray(pixel_positional_embedding(h, w, c))
    assert pe.shape == (h, w, c)
    half = c // 2
    div = np.exp(np.arange(0, half, 2) * -(math.log(10000.0) / half))
    for y in range(h):
        for x in range(w):
            np.testing.assert_allclose(pe[y, x, 0:half:2], np.sin(x * div),
                                       atol=1e-6)
            np.testing.assert_allclose(pe[y, x, 1:half:2], np.cos(x * div),
                                       atol=1e-6)
            np.testing.assert_allclose(pe[y, x, half::2], np.sin(y * div),
                                       atol=1e-6)
            np.testing.assert_allclose(pe[y, x, half + 1::2],
                                       np.cos(y * div), atol=1e-6)


def test_local_pixel_frame_offsets_golden():
    """local_frame_selector (generalized_rcnn_mega.py:60-74) with the
    default 25-frame window, key at 12."""
    from diffusionvid_tpu.models.video_archs import local_pixel_frame_offsets
    assert local_pixel_frame_offsets() == [-12, -8, -4, -2, -1, 0,
                                           1, 2, 4, 8, 12]
    assert local_pixel_frame_offsets(interval=9, key_location=4) == \
        [-4, -2, -1, 0, 1, 2, 4]


def test_pixels_in_boxes():
    """get_pixels_index geometry (stride-16 grid, center-in-box); the
    reference's h/w meshgrid swap is intentionally NOT reproduced."""
    from diffusionvid_tpu.models.video_archs import _pixels_in_boxes
    h, w = 4, 6
    boxes = jnp.asarray([[16.0, 0.0, 47.9, 31.9],      # grid x 1-2, y 0-1
                         [80.0, 48.0, 95.9, 63.9]])    # grid x 5, y 3
    valid = jnp.asarray([True, False])
    m = np.asarray(_pixels_in_boxes(h, w, boxes, valid)).reshape(h, w)
    expect = np.zeros((h, w), bool)
    expect[0:2, 1:3] = True           # first box only (second invalid)
    np.testing.assert_array_equal(m, expect)


def test_ring_write_and_irrelevant():
    from diffusionvid_tpu.models.video_archs import (
        _irrelevant_pixels, _ring_write, _ring_valid)
    from diffusionvid_tpu.ops.memory import init_memory

    mem = init_memory(8, 4)
    new = jnp.arange(24, dtype=jnp.float32).reshape(6, 4)
    v = jnp.asarray([True, True, False, True, False, False])
    mem = _ring_write(mem, new, v)
    assert int(mem.count) == 3
    assert np.asarray(_ring_valid(mem)).sum() == 3
    # valid rows landed compacted at the front of the ring
    np.testing.assert_array_equal(np.asarray(mem.feats[0]), [0, 1, 2, 3])
    np.testing.assert_array_equal(np.asarray(mem.feats[2]), [12, 13, 14, 15])
    # wrap: 6 more valid rows overwrite the oldest slots
    mem = _ring_write(mem, new, jnp.ones((6,), bool))
    assert int(mem.count) == 9
    assert np.asarray(_ring_valid(mem)).sum() == 8

    # irrelevant pixels: rows with norm above the uniform-softmax bar
    px = jnp.zeros((32, 4)).at[5].set(100.0).at[17].set(90.0)
    sel, valid = _irrelevant_pixels(px, k=4)
    got = {tuple(r) for r in np.asarray(sel)[np.asarray(valid)]}
    assert got == {(100.0,) * 4, (90.0,) * 4}
