"""Classic path tests: anchors, proposal selection, matching/sampling,
GeneralizedRCNN train + inference on tiny shapes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusionvid_tpu.models.rpn import (
    generate_anchors, shift_anchors, select_proposals, match_anchors,
    sample_balanced, rpn_loss,
)
from diffusionvid_tpu.ops.nms import nms_select
from diffusionvid_tpu.models.rcnn import GeneralizedRCNN

pytestmark = pytest.mark.slow  # model-jitting integration tests (run with -m slow)


def test_anchor_generation():
    base = generate_anchors(sizes=(64, 128), ratios=(0.5, 1.0, 2.0), stride=16)
    assert base.shape == (6, 4)
    # ratio-1 anchors are square
    sq = base[np.isclose((base[:, 2] - base[:, 0]), (base[:, 3] - base[:, 1]))]
    assert len(sq) >= 2
    grid = shift_anchors(base, 4, 5, 16)
    assert grid.shape == (4 * 5 * 6, 4)
    # second cell shifted by stride in x
    np.testing.assert_allclose(grid[6] - grid[0], [16, 0, 16, 0])


def test_nms_select_matches_mask_nms():
    from diffusionvid_tpu.ops.nms import nms_mask
    rng = np.random.RandomState(0)
    boxes = rng.uniform(0, 80, (64, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(5, 40, (64, 2))
    scores = rng.rand(64).astype(np.float32)
    keep_mask = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                    0.5, plus_one=True))
    idx, val = nms_select(jnp.asarray(boxes), jnp.asarray(scores), 64, 0.5,
                          plus_one=True)
    got = set(np.asarray(idx)[np.asarray(val)].tolist())
    assert got == set(np.nonzero(keep_mask)[0].tolist())


def test_select_proposals_shapes():
    b, h, w, a = 2, 8, 10, 6
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(b, h, w, a).astype(np.float32))
    deltas = jnp.asarray(0.1 * rng.randn(b, h, w, 4 * a).astype(np.float32))
    anchors = jnp.asarray(shift_anchors(
        generate_anchors(sizes=(32, 64), ratios=(0.5, 1.0, 2.0), stride=16),
        h, w, 16))
    props = select_proposals(logits, deltas, anchors, (128, 160),
                             pre_nms=100, post_nms=20)
    assert props.boxes.shape == (b, 20, 4)
    assert props.valid.any()
    bx = np.asarray(props.boxes)
    assert bx.min() >= 0 and bx[..., 0::2].max() <= 159 and bx[..., 1::2].max() <= 127


def test_match_and_sample():
    anchors = jnp.asarray([[0, 0, 10, 10], [50, 50, 60, 60],
                           [100, 100, 110, 110]], jnp.float32)
    gt = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
    gtv = jnp.asarray([True])
    matched, labels = match_anchors(anchors, gt, gtv)
    assert int(labels[0]) == 1       # exact match → fg
    assert int(labels[1]) == 0       # far → bg
    pos, neg = sample_balanced(jax.random.PRNGKey(0), labels, 4, 0.5)
    assert bool(pos[0]) and not bool(neg[0])


def test_generalized_rcnn_train_and_infer():
    model = GeneralizedRCNN(depth=50, num_classes=6, anchor_sizes=(32, 64),
                            pre_nms_test=64, post_nms_test=16,
                            pre_nms_train=64, post_nms_train=16)
    b, h, w, g = 1, 64, 96, 4
    images = jnp.asarray(np.random.RandomState(0).uniform(
        0, 255, (b, h, w, 3)).astype(np.float32))
    gt_boxes = jnp.tile(jnp.asarray([10.0, 10.0, 50.0, 40.0]), (b, g, 1))
    gt_labels = jnp.full((b, g), 2, jnp.int32)
    gt_valid = jnp.zeros((b, g), bool).at[:, 0].set(True)

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
        images, (h, w), gt_boxes, gt_labels, gt_valid, train=True)
    losses = model.apply(variables, images, (h, w), gt_boxes, gt_labels,
                         gt_valid, train=True,
                         rngs={"sampler": jax.random.PRNGKey(2)})
    for k in ("loss_objectness", "loss_rpn_box_reg", "loss_classifier",
              "loss_box_reg"):
        assert np.isfinite(float(losses[k])), k

    dets = model.apply(variables, images, (h, w), train=False)
    assert dets.boxes.shape == (b, 300, 4)
    assert np.isfinite(np.asarray(dets.boxes)).all()

    # ref-frame proposal path (75 proposals for the MEGA family)
    feat = model.apply(variables, images, method=GeneralizedRCNN.features)
    props, _ = model.apply(variables, feat, (h, w), ref=True,
                           method=GeneralizedRCNN.proposals)
    assert props.boxes.shape == (b, 75, 4)
