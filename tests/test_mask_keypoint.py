"""Mask + keypoint ROI heads (MODEL.MASK_ON / KEYPOINT_ON — reference
mask_head/*.py + keypoint_head/*.py; shape + loss + decode tests)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusionvid_tpu.models.mask_keypoint import (
    KeypointHead, MaskHead, heatmaps_to_keypoints, keypoint_loss,
    mask_loss, paste_masks)


def _feats(b=1, h=16, w=24, c=64, seed=0):
    rng = np.random.RandomState(seed)
    return [jnp.asarray(rng.randn(b, h, w, c), jnp.float32)]


def test_mask_head_shapes():
    feats = _feats()
    boxes = jnp.asarray([[[8.0, 8.0, 120.0, 96.0], [40.0, 20.0, 90.0, 70.0]]])
    m = MaskHead(num_classes=5, conv_layers=(32, 32), pooler_resolution=14)
    v = m.init(jax.random.PRNGKey(0), feats, (1 / 16,), boxes)
    out = m.apply(v, feats, (1 / 16,), boxes)
    assert out.shape == (1, 2, 28, 28, 5)
    assert np.isfinite(np.asarray(out)).all()
    # torch param layout: conv5_mask is IOHW transposed-conv weight
    assert v["params"]["conv5_mask"]["weight"].shape == (32, 32, 2, 2)
    assert v["params"]["mask_fcn1"]["weight"].shape == (32, 64, 3, 3)


def test_keypoint_head_shapes():
    feats = _feats()
    boxes = jnp.asarray([[[8.0, 8.0, 120.0, 96.0]]])
    m = KeypointHead(num_keypoints=4, conv_layers=(32, 32))
    v = m.init(jax.random.PRNGKey(0), feats, (1 / 16,), boxes)
    out = m.apply(v, feats, (1 / 16,), boxes)
    assert out.shape == (1, 1, 56, 56, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_mask_loss_positive_and_learnable():
    b, r, m, k, g = 1, 4, 8, 3, 2
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(b, r, m, m, k), jnp.float32)
    boxes = jnp.asarray(rng.uniform(0, 30, (b, r, 4)), jnp.float32)
    boxes = boxes.at[..., 2:].set(boxes[..., :2] + 20)
    labels = jnp.asarray([[1, 2, 0, 1]], jnp.int32)
    valid = jnp.asarray([[True, True, True, False]])
    gt_masks = jnp.asarray(rng.rand(b, g, 64, 64) > 0.5, jnp.float32)
    gt_boxes = jnp.asarray([[[0.0, 0.0, 40.0, 40.0], [10.0, 10.0, 50.0, 50.0]]])
    gt_labels = jnp.asarray([[1, 2]], jnp.int32)
    gt_valid = jnp.ones((b, g), bool)
    loss = mask_loss(logits, boxes, labels, valid, gt_masks, gt_boxes,
                     gt_labels, gt_valid)
    assert np.isfinite(float(loss)) and float(loss) > 0
    # perfect logits on the target crop → loss decreases
    grad = jax.grad(lambda lg: mask_loss(lg, boxes, labels, valid, gt_masks,
                                         gt_boxes, gt_labels, gt_valid))(logits)
    assert np.isfinite(np.asarray(grad)).all()
    better = mask_loss(logits - 0.1 * grad, boxes, labels, valid, gt_masks,
                       gt_boxes, gt_labels, gt_valid)
    assert float(better) < float(loss)


def test_keypoint_loss_and_decode_roundtrip():
    b, r, s, k = 1, 2, 16, 3
    boxes = np.asarray([[[0.0, 0.0, 32.0, 32.0], [10.0, 10.0, 42.0, 42.0]]],
                       np.float32)
    # GT keypoints at known positions inside the boxes
    kps = np.asarray([[[[8.0, 8.0, 1], [16.0, 24.0, 1], [0.0, 0.0, 0]],
                       [[20.0, 20.0, 1], [30.0, 40.0, 1], [0.0, 0.0, 0]]]],
                     np.float32)
    valid = np.ones((b, r), bool)
    # logits peaked at the correct cells → tiny loss
    logits = np.full((b, r, s, s, k), -5.0, np.float32)
    for i in range(r):
        x1, y1, x2, y2 = boxes[0, i]
        for j in range(k):
            if kps[0, i, j, 2] > 0:
                px = int((kps[0, i, j, 0] - x1) / (x2 - x1) * s)
                py = int((kps[0, i, j, 1] - y1) / (y2 - y1) * s)
                logits[0, i, py, px, j] = 10.0
    good = float(keypoint_loss(jnp.asarray(logits), jnp.asarray(boxes),
                               jnp.asarray(kps), jnp.asarray(valid)))
    bad = float(keypoint_loss(jnp.asarray(np.roll(logits, 4, axis=2)),
                              jnp.asarray(boxes), jnp.asarray(kps),
                              jnp.asarray(valid)))
    assert good < 0.2 < bad
    # decode: argmax maps back near the GT coordinates
    dec = heatmaps_to_keypoints(logits[0], boxes[0])
    assert abs(dec[0, 0, 0] - 8.0) <= 2.5 and abs(dec[0, 0, 1] - 8.0) <= 2.5
    assert abs(dec[1, 1, 0] - 30.0) <= 2.5 and abs(dec[1, 1, 1] - 40.0) <= 2.5


def test_paste_masks():
    probs = np.zeros((1, 4, 4), np.float32)
    probs[0, 1:3, 1:3] = 0.9
    out = paste_masks(probs, np.asarray([[10.0, 10.0, 30.0, 30.0]]), 40, 40)
    assert out.shape == (1, 40, 40)
    assert out[0, 20, 20] == 1 and out[0, 5, 5] == 0
    assert 20 <= out.sum() <= 160


def test_coco_mask_config_builds():
    from diffusionvid_tpu.config import load_config
    from diffusionvid_tpu.models.detectors import build_detection_model
    cfg = load_config("configs/e2e_mask_rcnn_R_50_C4_1x.yaml")
    assert cfg.MODEL.MASK_ON
    model = build_detection_model(cfg, dtype=jnp.float32)
    assert model.mask_on


@pytest.mark.slow
def test_rcnn_mask_forward():
    """MASK_ON GeneralizedRCNN runs the CombinedROIHeads test path:
    detections + per-detection class-selected sigmoid masks."""
    from diffusionvid_tpu.models.rcnn import GeneralizedRCNN
    model = GeneralizedRCNN(depth=18, num_classes=5, anchor_sizes=(32, 64),
                            pre_nms_test=32, post_nms_test=8,
                            pre_nms_train=32, post_nms_train=8,
                            mask_on=True, keypoint_on=True, num_keypoints=4)
    h, w = 64, 96
    x = jnp.asarray(np.random.RandomState(0).uniform(0, 255, (1, h, w, 3)),
                    jnp.float32)
    v = model.init({"params": jax.random.PRNGKey(0)}, x, (h, w), train=False)
    out = model.apply(v, x, (h, w), train=False)
    assert set(out.keys()) == {"dets", "masks", "keypoints"}
    d = out["dets"].boxes.shape[1]
    assert out["masks"].shape == (1, d, 28, 28)
    assert out["keypoints"].shape == (1, d, 56, 56, 4)
    mp = np.asarray(out["masks"])
    assert (mp >= 0).all() and (mp <= 1).all()
