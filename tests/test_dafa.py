"""DAFA (Sparse R-CNN + temporal aggregation) tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusionvid_tpu.models.dafa import SparseRCNNDAFA
from diffusionvid_tpu.models.criterion import set_criterion

pytestmark = pytest.mark.slow  # model-jitting integration tests (run with -m slow)

H, W = 64, 96


def _model():
    return SparseRCNNDAFA(depth=50, num_classes=5, num_proposals=8,
                          num_stages=2, top_k=4, memory_size=16)


def test_dafa_forward_and_criterion():
    model = _model()
    imgs = jnp.asarray(np.random.RandomState(0).uniform(
        0, 255, (2, H, W, 3)).astype(np.float32))
    whwh = jnp.asarray([W, H, W, H], jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, imgs, whwh)
    logits, boxes = model.apply(variables, imgs, whwh)
    assert logits.shape == (2, 2, 8, 5)
    assert boxes.shape == (2, 2, 8, 4)
    assert np.isfinite(np.asarray(logits)).all()

    gt_boxes = jnp.tile(jnp.asarray([10.0, 10.0, 50.0, 40.0]), (2, 4, 1))
    gt_labels = jnp.full((2, 4), 2, jnp.int32)
    gt_valid = jnp.zeros((2, 4), bool).at[:, 0].set(True)
    whwh_b = jnp.tile(whwh[None], (2, 1))
    total, losses = set_criterion(logits, boxes, gt_labels, gt_boxes,
                                  gt_valid, whwh_b, 5)
    assert np.isfinite(float(total))


def test_dafa_memory_streaming():
    model = _model()
    imgs = jnp.asarray(np.random.RandomState(1).uniform(
        0, 255, (2, H, W, 3)).astype(np.float32))
    whwh = jnp.asarray([W, H, W, H], jnp.float32)
    state = model.init_state()
    variables = model.init({"params": jax.random.PRNGKey(0)}, imgs, whwh,
                           state=state)
    feats = model.apply(variables, imgs, whwh, method=SparseRCNNDAFA.extract_topk)
    assert feats.shape == (2 * 4, 256)
    state = model.apply(variables, state, feats,
                        method=SparseRCNNDAFA.update_memory)
    assert int(state.mem.count) == 8

    logits, boxes = model.apply(variables, imgs, whwh, state=state)
    assert np.isfinite(np.asarray(logits)).all()
