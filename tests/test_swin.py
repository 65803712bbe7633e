"""Swin backbone tests: stage shapes, shifted-window masking, numerical
sanity, and integration with the DiffusionDet arch."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusionvid_tpu.models.swin import (
    SwinTransformer, _relative_position_index, _shift_attn_mask,
    window_partition, window_reverse,
)

pytestmark = pytest.mark.slow  # model-jitting integration tests (run with -m slow)


def test_relative_position_index():
    idx = _relative_position_index(3)
    assert idx.shape == (9, 9)
    assert idx.min() >= 0 and idx.max() < 25
    assert idx[0, 0] == idx[4, 4]  # self-offsets identical


def test_window_partition_roundtrip():
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    w = window_partition(x, 4)
    assert w.shape == (2 * 4, 16, 3)
    rec = window_reverse(w, 4, 2, 8, 8)
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(x))


def test_shift_mask_blocks_cross_region():
    m = _shift_attn_mask(14, 14, 7, 3)
    assert m.shape == (4, 49, 49)
    assert (m == 0).any() and (m == -100).any()
    # first window (interior) is fully visible
    np.testing.assert_array_equal(m[0], 0)


def test_swin_tiny_forward_shapes():
    model = SwinTransformer(embed_dim=32, depths=(1, 1, 1, 1),
                            num_heads=(1, 2, 4, 8), window=4,
                            dtype=jnp.float32)
    x = jnp.zeros((1, 64, 96, 3))
    params = model.init({"params": jax.random.PRNGKey(0)}, x)
    out = model.apply(params, x)
    assert out["swin0"].shape == (1, 16, 24, 32)
    assert out["swin1"].shape == (1, 8, 12, 64)
    assert out["swin2"].shape == (1, 4, 6, 128)
    assert out["swin3"].shape == (1, 2, 3, 256)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()


def test_swin_handles_non_window_divisible():
    model = SwinTransformer(embed_dim=16, depths=(2,), num_heads=(2,),
                            window=4, out_indices=(0,), dtype=jnp.float32)
    x = jnp.ones((1, 52, 36, 3))   # 13×9 patches — not divisible by 4
    params = model.init({"params": jax.random.PRNGKey(0)}, x)
    out = model.apply(params, x)
    assert out["swin0"].shape == (1, 13, 9, 16)
    assert np.isfinite(np.asarray(out["swin0"])).all()


def test_diffusiondet_with_swin_backbone():
    from diffusionvid_tpu.models.diffusion_det import DiffusionDetArch
    model = DiffusionDetArch(
        num_classes=5, num_proposals=8, hidden_dim=256, num_heads=1,
        num_heads_local=1, backbone_type="swin", swin_size="T",
        fpn_in=("swin1", "swin2", "swin3"), compute_dtype=jnp.float32)
    b, h, w = 2, 64, 96
    noisy = jnp.tile(jnp.asarray([8.0, 8.0, 60.0, 40.0]), (b, 8, 1))
    t = jnp.zeros((b,), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "cfg": jax.random.PRNGKey(1)},
        jnp.zeros((b, h, w, 3)), noisy, t, num_global=1, train=True)
    logits, boxes = model.apply(
        variables, jnp.zeros((b, h, w, 3)), noisy, t, num_global=1,
        train=True, rngs={"cfg": jax.random.PRNGKey(2)})
    assert logits.shape == (2, b, 8, 5)
    assert np.isfinite(np.asarray(logits)).all()


def test_swin_config_integration():
    import os
    import pytest
    path = "/root/reference/configs/vid_Swin_B_DiffusionVID.yaml"
    if not os.path.exists(path):
        pytest.skip("reference absent")
    from diffusionvid_tpu.config import load_config
    from diffusionvid_tpu.models.diffusion_det import DiffusionDetArch
    cfg = load_config(path)
    model = DiffusionDetArch.from_config(cfg, dtype=jnp.float32)
    assert model.backbone_type == "swin"
    assert model.swin_size == "B-22k"
    assert model.fpn_in == ("swin1", "swin2", "swin3")


def test_fused_window_attention_matches_einsum_interpreted():
    """The Pallas fused window-attention kernel (map in, map out — no
    partition/reverse, in-VMEM softmax) must match the batched-einsum
    formulation, with and without the SW-MSA mask."""
    from jax.experimental.pallas import tpu as pltpu
    from diffusionvid_tpu.ops.swin_attention_pallas import (
        fused_window_attention)

    rng = np.random.RandomState(0)
    b, hp, wp, c, h, w = 2, 14, 21, 32, 4, 7
    n = w * w
    dh = c // h
    q, k, v = (jnp.asarray(rng.randn(b, hp, wp, c).astype(np.float32))
               for _ in range(3))
    bias = jnp.asarray(rng.randn(h, n, n).astype(np.float32))

    def reference(q, k, v, mask):
        qw = window_partition(q, w).reshape(-1, n, h, dh)
        kw = window_partition(k, w).reshape(-1, n, h, dh)
        vw = window_partition(v, w).reshape(-1, n, h, dh)
        nb = qw.shape[0]
        attn = jnp.einsum("bnhd,bmhd->bhnm", qw, kw,
                          preferred_element_type=jnp.float32) * (dh ** -0.5)
        attn = attn + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = (attn.reshape(nb // nw, nw, h, n, n) + mask[None, :, None]
                    ).reshape(nb, h, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, vw).reshape(nb, n, c)
        return window_reverse(out, w, b, hp, wp)

    mask = jnp.asarray(_shift_attn_mask(hp, wp, w, 3))

    for m in (None, mask):
        ref = reference(q, k, v, m)
        m4 = None if m is None else m.reshape(hp // w, wp // w, n, n)
        with pltpu.force_tpu_interpret_mode():
            got = fused_window_attention(q, k, v, bias, m4, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)


def test_fused_window_attention_qkv_matches_interpreted():
    """v2 kernel (qkv fused in-kernel) must match computing q/k/v maps
    in XLA and running the v1 kernel formulation's reference."""
    from jax.experimental.pallas import tpu as pltpu
    from diffusionvid_tpu.ops.swin_attention_pallas import (
        fused_window_attention_qkv)

    rng = np.random.RandomState(1)
    b, hp, wp, c, h, w = 2, 14, 21, 32, 4, 7
    n = w * w
    dh = c // h
    x = jnp.asarray(rng.randn(b, hp, wp, c).astype(np.float32))
    wqkv = jnp.asarray(rng.randn(3 * c, c).astype(np.float32)) * 0.1
    bqkv = jnp.asarray(rng.randn(3 * c).astype(np.float32)) * 0.1
    bias = jnp.asarray(rng.randn(h, n, n).astype(np.float32))

    def reference(mask):
        q = x @ wqkv[:c].T + bqkv[:c]
        k = x @ wqkv[c:2 * c].T + bqkv[c:2 * c]
        v = x @ wqkv[2 * c:].T + bqkv[2 * c:]
        qw = window_partition(q, w).reshape(-1, n, h, dh)
        kw = window_partition(k, w).reshape(-1, n, h, dh)
        vw = window_partition(v, w).reshape(-1, n, h, dh)
        nb = qw.shape[0]
        attn = jnp.einsum("bnhd,bmhd->bhnm", qw, kw,
                          preferred_element_type=jnp.float32) * (dh ** -0.5)
        attn = attn + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = (attn.reshape(nb // nw, nw, h, n, n) + mask[None, :, None]
                    ).reshape(nb, h, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, vw).reshape(nb, n, c)
        return window_reverse(out, w, b, hp, wp)

    mask = jnp.asarray(_shift_attn_mask(hp, wp, w, 3))
    for m in (None, mask):
        ref = reference(m)
        m4 = None if m is None else m.reshape(hp // w, wp // w, n, n)
        with pltpu.force_tpu_interpret_mode():
            got = fused_window_attention_qkv(x, wqkv, bqkv, bias, m4, w, h)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-5, rtol=1e-4)


def test_fused_window_attention_qkv_vjp_matches_einsum_grads():
    """The training wrapper's custom VJP (fused forward + einsum-recompute
    backward) must produce the same gradients as differentiating the
    einsum twin directly, for x / wqkv / bqkv / bias, masked and not."""
    from jax.experimental.pallas import tpu as pltpu
    from diffusionvid_tpu.ops.swin_attention_pallas import (
        fused_window_attention_qkv_trainable, _einsum_window_attention_qkv)

    rng = np.random.RandomState(3)
    b, hp, wp, c, h, w = 1, 14, 14, 32, 4, 7
    n = w * w
    x = jnp.asarray(rng.randn(b, hp, wp, c).astype(np.float32))
    wqkv = jnp.asarray(rng.randn(3 * c, c).astype(np.float32)) * 0.1
    bqkv = jnp.asarray(rng.randn(3 * c).astype(np.float32)) * 0.1
    bias = jnp.asarray(rng.randn(h, n, n).astype(np.float32))
    mask = jnp.asarray(_shift_attn_mask(hp, wp, w, 3))
    g = jnp.asarray(rng.randn(b, hp, wp, c).astype(np.float32))

    for m in (None, mask):
        m4 = None if m is None else m.reshape(hp // w, wp // w, n, n)

        def loss_kernel(x_, w_, b_, bi_):
            out = fused_window_attention_qkv_trainable(x_, w_, b_, bi_,
                                                       m4, w, h)
            return jnp.sum(out * g)

        def loss_einsum(x_, w_, b_, bi_):
            out = _einsum_window_attention_qkv(x_, w_, b_, bi_, m4, w, h)
            return jnp.sum(out * g)

        with pltpu.force_tpu_interpret_mode():
            val_k, grads_k = jax.value_and_grad(
                loss_kernel, argnums=(0, 1, 2, 3))(x, wqkv, bqkv, bias)
        val_e, grads_e = jax.value_and_grad(
            loss_einsum, argnums=(0, 1, 2, 3))(x, wqkv, bqkv, bias)

        np.testing.assert_allclose(float(val_k), float(val_e),
                                   rtol=1e-5, atol=1e-4)
        for gk, ge, name in zip(grads_k, grads_e,
                                ("x", "wqkv", "bqkv", "bias")):
            np.testing.assert_allclose(np.asarray(gk), np.asarray(ge),
                                       rtol=1e-4, atol=2e-4,
                                       err_msg=name)


def test_fused_swin_block_matches_xla_composition_interpreted():
    """The v3 whole-half-block kernels (LN1+pad-zero+attention+proj+res,
    LN2+MLP+res) must reproduce the SwinBlock XLA composition — padded
    map, shifted and unshifted, including the rolled-coordinate pad-zero
    mask."""
    from jax.experimental.pallas import tpu as pltpu
    from diffusionvid_tpu.ops.swin_attention_pallas import (
        fused_swin_block_attn, fused_swin_block_mlp)

    rng = np.random.RandomState(7)
    b, c, h, w = 2, 32, 4, 7
    hv, wv = 12, 19              # true size -> padded 14 x 21
    hp, wp = 14, 21
    n = w * w
    x = jnp.asarray(rng.randn(b, hp, wp, c).astype(np.float32))
    # the pad region of the residual stream carries stage-loop garbage;
    # make it nonzero to prove the mask handles it
    ln_g = jnp.asarray(1.0 + 0.1 * rng.randn(c).astype(np.float32))
    ln_b = jnp.asarray(0.1 * rng.randn(c).astype(np.float32))
    wqkv = jnp.asarray(rng.randn(3 * c, c).astype(np.float32)) * 0.1
    bqkv = jnp.asarray(rng.randn(3 * c).astype(np.float32)) * 0.1
    bias = jnp.asarray(rng.randn(h, n, n).astype(np.float32))
    wproj = jnp.asarray(rng.randn(c, c).astype(np.float32)) * 0.1
    bproj = jnp.asarray(rng.randn(c).astype(np.float32)) * 0.1

    def ln(z, g, bb):
        mu = z.mean(-1, keepdims=True)
        var = ((z - mu) ** 2).mean(-1, keepdims=True)
        return (z - mu) * jax.lax.rsqrt(var + 1e-5) * g + bb

    def xla_attn_half(x, shift):
        y = ln(x, ln_g, ln_b)
        valid = np.zeros((1, hp, wp, 1), np.float32)
        valid[:, :hv, :wv] = 1.0
        y = y * jnp.asarray(valid)
        if shift:
            y = jnp.roll(y, (-shift, -shift), (1, 2))
            mask = jnp.asarray(_shift_attn_mask(hp, wp, w, shift))
        else:
            mask = None
        q = y @ wqkv[:c].T + bqkv[:c]
        k = y @ wqkv[c:2 * c].T + bqkv[c:2 * c]
        v = y @ wqkv[2 * c:].T + bqkv[2 * c:]
        dh = c // h
        qw = window_partition(q, w).reshape(-1, n, h, dh)
        kw = window_partition(k, w).reshape(-1, n, h, dh)
        vw = window_partition(v, w).reshape(-1, n, h, dh)
        nb = qw.shape[0]
        attn = jnp.einsum("bnhd,bmhd->bhnm", qw, kw) * (dh ** -0.5) + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = (attn.reshape(nb // nw, nw, h, n, n) + mask[None, :, None]
                    ).reshape(nb, h, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, vw).reshape(nb, n, c)
        out = window_reverse(out, w, b, hp, wp)
        if shift:
            out = jnp.roll(out, (shift, shift), (1, 2))
        return x + (out @ wproj.T + bproj)

    g2 = jnp.asarray(1.0 + 0.1 * rng.randn(c).astype(np.float32))
    b2 = jnp.asarray(0.1 * rng.randn(c).astype(np.float32))
    hidden = 2 * c
    w1 = jnp.asarray(rng.randn(hidden, c).astype(np.float32)) * 0.1
    b1m = jnp.asarray(rng.randn(hidden).astype(np.float32)) * 0.1
    w2 = jnp.asarray(rng.randn(c, hidden).astype(np.float32)) * 0.1
    b2m = jnp.asarray(rng.randn(c).astype(np.float32)) * 0.1

    for shift in (0, 3):
        ref = xla_attn_half(x, shift)
        if shift:
            xr = jnp.roll(x, (-shift, -shift), (1, 2))
            m4 = jnp.asarray(_shift_attn_mask(hp, wp, w, shift)).reshape(
                hp // w, wp // w, n, n)
        else:
            xr, m4 = x, None
        with pltpu.force_tpu_interpret_mode():
            got = fused_swin_block_attn(xr, ln_g, ln_b, wqkv, bqkv, bias,
                                        m4, wproj, bproj, w, h, (hv, wv),
                                        shift=shift)
        if shift:
            got = jnp.roll(got, (shift, shift), (1, 2))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-5, rtol=1e-4,
                                   err_msg=f"attn half, shift={shift}")

        ref2 = ref + jax.nn.gelu(ln(ref, g2, b2) @ w1.T + b1m,
                                 approximate=False) @ w2.T + b2m
        with pltpu.force_tpu_interpret_mode():
            got2 = fused_swin_block_mlp(got, g2, b2, w1, b1m, w2, b2m,
                                        rows=w)
        np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                                   atol=5e-5, rtol=1e-4,
                                   err_msg=f"mlp half, shift={shift}")
