"""Fused DynamicConv Pallas kernel vs its einsum twin (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusionvid_tpu.ops.dynamic_conv_pallas import (
    dynamic_conv_fused, dynamic_conv_ref)


def _inputs(s=11, p=49, d=64, e=16, seed=0, dtype=jnp.float32):
    r = np.random.RandomState(seed)
    roi = jnp.asarray(r.randn(s, p, d), dtype)
    p1t = jnp.asarray(r.randn(s, e, d) * 0.1, dtype)
    p2e = jnp.asarray(r.randn(s, e, d) * 0.1, dtype)  # e-major [S, E, D]
    g1 = jnp.asarray(1.0 + 0.1 * r.randn(e), jnp.float32)
    b1 = jnp.asarray(0.1 * r.randn(e), jnp.float32)
    g2 = jnp.asarray(1.0 + 0.1 * r.randn(d), jnp.float32)
    b2 = jnp.asarray(0.1 * r.randn(d), jnp.float32)
    return roi, p1t, p2e, g1, b1, g2, b2


def test_kernel_matches_einsum_fp32():
    args = _inputs()
    out_k = dynamic_conv_fused(*args, interpret=True)
    out_r = dynamic_conv_ref(*args)
    assert out_k.shape == out_r.shape == args[0].shape
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               atol=2e-5, rtol=2e-5)


def test_kernel_matches_einsum_bf16():
    args = _inputs(s=8, dtype=jnp.bfloat16)
    out_k = dynamic_conv_fused(*args, interpret=True)
    out_r = dynamic_conv_ref(*args)
    np.testing.assert_allclose(np.asarray(out_k, np.float32),
                               np.asarray(out_r, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_kernel_pads_nondivisible_s():
    # S=11 is not a multiple of the proposal block — wrapper pads/slices
    args = _inputs(s=11)
    out = dynamic_conv_fused(*args, interpret=True)
    assert out.shape[0] == 11
    assert np.isfinite(np.asarray(out)).all()


def test_dynparam_p2_major_equivalence():
    """p2_major='e' (kernel orientation) is the same projection as the
    d-major NT form, transposed — same parameter tree, same arithmetic."""
    from diffusionvid_tpu.models.heads import DynParamLinear
    x = jnp.asarray(np.random.RandomState(3).randn(6, 16), jnp.float32)
    m_d = DynParamLinear(8, 4, p2_major="d")
    m_e = DynParamLinear(8, 4, p2_major="e")
    v = m_d.init(jax.random.PRNGKey(0), x)
    p1d, p2d = m_d.apply(v, x)          # p2d [S, d, dd]
    p1e, p2e = m_e.apply(v, x)          # p2e [S, dd, d]
    np.testing.assert_allclose(np.asarray(p1d), np.asarray(p1e))
    np.testing.assert_allclose(np.asarray(p2e),
                               np.asarray(jnp.transpose(p2d, (0, 2, 1))),
                               atol=1e-6, rtol=1e-6)


def test_kernel_gradients_match_einsum():
    args = _inputs(s=5, p=7, d=32, e=8)

    def loss_k(roi, p1t, p2t, g1, b1, g2, b2):
        return jnp.sum(dynamic_conv_fused(roi, p1t, p2t, g1, b1, g2, b2,
                                          1e-5, True) ** 2)

    def loss_r(roi, p1t, p2t, g1, b1, g2, b2):
        return jnp.sum(dynamic_conv_ref(roi, p1t, p2t, g1, b1, g2, b2) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 6))(*args)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 6))(*args)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)
