"""Deformable conv / ROIPool parity-op tests."""

import numpy as np
import jax
import jax.numpy as jnp

from diffusionvid_tpu.ops.deform import deform_conv2d, roi_pool, deform_psroi_pool


def test_deform_conv_zero_offset_equals_conv():
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(1, 8, 10, 3).astype(np.float32))
    weight = jnp.asarray(rng.randn(4, 3, 3, 3).astype(np.float32))
    offsets = jnp.zeros((1, 8, 10, 2 * 9))
    out = deform_conv2d(feat, offsets, weight, padding=1)

    ref = jax.lax.conv_general_dilated(
        feat, jnp.transpose(weight, (2, 3, 1, 0)), (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


def test_deform_conv_v2_mask_scales():
    rng = np.random.RandomState(1)
    feat = jnp.asarray(rng.randn(1, 6, 6, 2).astype(np.float32))
    weight = jnp.asarray(rng.randn(2, 2, 3, 3).astype(np.float32))
    offsets = jnp.zeros((1, 6, 6, 18))
    half = deform_conv2d(feat, offsets, weight, padding=1,
                         mask=jnp.full((1, 6, 6, 9), 0.5))
    full = deform_conv2d(feat, offsets, weight, padding=1)
    np.testing.assert_allclose(np.asarray(half), 0.5 * np.asarray(full), atol=1e-4)


def test_deform_conv_differentiable():
    feat = jnp.ones((1, 6, 6, 2))
    weight = jnp.ones((2, 2, 3, 3))
    offsets = jnp.full((1, 6, 6, 18), 0.3)

    g = jax.grad(lambda o: deform_conv2d(feat, o, weight, padding=1).sum())(offsets)
    assert np.isfinite(np.asarray(g)).all()


def test_roi_pool_max_semantics():
    feat = jnp.zeros((1, 8, 8, 1)).at[0, 2, 3, 0].set(9.0)
    rois = jnp.asarray([[[0.0, 0.0, 32.0, 32.0]]])  # covers whole map at 1/4
    out = np.asarray(roi_pool(feat, rois, spatial_scale=0.25, output_size=2))
    assert out.shape == (1, 1, 2, 2, 1)
    # the bin containing the peak (top-left) carries the max response
    assert out[0, 0, 0, 0, 0] == out.max() and out.max() > 0
    assert out[0, 0, 1, 1, 0] == 0.0


def test_deform_psroi_pool_shapes():
    rng = np.random.RandomState(2)
    feat = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    rois = jnp.asarray([[[4.0, 4.0, 28.0, 28.0]]])
    offsets = jnp.zeros((1, 1, 3 * 3 * 2))
    out = deform_psroi_pool(feat, rois, offsets, 0.25, output_size=3)
    assert out.shape == (1, 1, 3, 3, 4)
    assert np.isfinite(np.asarray(out)).all()
