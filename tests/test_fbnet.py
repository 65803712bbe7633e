"""FBNet family (reference fbnet_modeldef.py archs + fbnet_builder.py
block vocabulary) — shape and role-split tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusionvid_tpu.models.fbnet import (
    FBNET_ARCHS, FBNetBoxHead, FBNetMaskHead, FBNetRPNHead, FBNetTrunk,
    InvertedResidual, _channel_shuffle, _expand_blocks)


# the chameleon/default trunks are the heaviest jits in the default suite
# (20-33 s each on this 1-CPU host) — keep one representative trunk fast,
# run the rest with -m slow (suite budget, pytest.ini)
_HEAVY_TRUNKS = {"default", "cham_v1a", "cham_v2"}


@pytest.mark.parametrize(
    "arch", [pytest.param(a, marks=pytest.mark.slow) if a in _HEAVY_TRUNKS
             else pytest.param(a) for a in sorted(FBNET_ARCHS)])
def test_trunk_shapes(arch):
    m = FBNetTrunk(arch=arch)
    x = jnp.zeros((1, 64, 96, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    # backbone stride 16 (first s2 + three s2 stages)
    assert y.shape == (1, 4, 6, m.out_channels)
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.parametrize(
    "arch", ["default",
             pytest.param("cham_v1a", marks=pytest.mark.slow),
             pytest.param("cham_v2", marks=pytest.mark.slow)])
def test_bbox_and_rpn_heads(arch):
    trunk_c = FBNetTrunk(arch=arch).out_channels
    x = jnp.zeros((2, 7, 7, trunk_c))
    head = FBNetBoxHead(arch=arch)
    v = head.init(jax.random.PRNGKey(0), x)
    y = head.apply(v, x)
    assert y.shape == (2, head.out_channels)
    rpn = FBNetRPNHead(arch=arch)
    xr = jnp.zeros((1, 8, 12, trunk_c))
    vr = rpn.init(jax.random.PRNGKey(0), xr)
    yr = rpn.apply(vr, xr)
    assert yr.shape[:3] == (1, 8, 12)


def test_mask_head_upsamples():
    """default mask stage ends with an s=-2 block → 2x spatial upsample."""
    trunk_c = FBNetTrunk(arch="default").out_channels
    m = FBNetMaskHead(arch="default")
    x = jnp.zeros((1, 7, 7, trunk_c))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape[1:3] == (14, 14)
    # xirb16d_dsmask has two -2 blocks → 4x
    m2 = FBNetMaskHead(arch="xirb16d_dsmask")
    v2 = m2.init(jax.random.PRNGKey(0), x)
    y2 = m2.apply(v2, x)
    # one s2 down (7 -> 4 with SAME pad) then two 2x up -> 16
    assert y2.shape[1:3] == (16, 16)


def test_expand_blocks_strides_and_ops():
    blocks = _expand_blocks([[6, 64, 4, 2], [6, 96, 3, 1]],
                            ["ir_k5"] * 7)
    assert len(blocks) == 7
    assert [b[3] for b in blocks] == [2, 1, 1, 1, 1, 1, 1]
    assert all(b[0] == "ir_k5" for b in blocks)
    # cham mixed ops per block
    blocks = _expand_blocks([[12, 56, 7, 2], [8, 88, 5, 1]],
                            ["ir_k5"] * 7 + ["ir_k3"] * 5)
    assert [b[0] for b in blocks[:7]] == ["ir_k5"] * 7
    assert [b[0] for b in blocks[7:]] == ["ir_k3"] * 5


def test_channel_shuffle_and_shuffle_block():
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 1, 1, 16)
    y = _channel_shuffle(x, 4)
    assert y.shape == x.shape
    assert np.asarray(y)[0, 0, 0, 1] == 4.0  # interleaved groups
    blk = InvertedResidual(16, 2, 3, 1, pw_group=4, shuffle=True, se=True)
    xi = jnp.zeros((1, 8, 8, 16))
    v = blk.init(jax.random.PRNGKey(0), xi)
    assert blk.apply(v, xi).shape == (1, 8, 8, 16)
    assert "se" in v["params"]
