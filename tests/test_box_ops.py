"""Box op golden-value tests.

Decode goldens come from the Caffe2 unit test numbers embedded in the
reference (``tests/test_box_coder.py``: UtilsBoxesTest.TestBboxTransformRandom).
"""

import numpy as np
import jax.numpy as jnp

from diffusionvid_tpu.structures import (
    cxcywh_to_xyxy, xyxy_to_cxcywh, pairwise_iou, pairwise_giou,
    elementwise_giou, decode_boxes, encode_boxes, clip_to_image,
)

BBOX = np.array([
    [175.62031555, 20.91103172, 253.352005, 155.0145874],
    [169.24636841, 4.85241556, 228.8605957, 105.02092743],
    [181.77426147, 199.82876587, 192.88427734, 214.0255127],
    [174.36262512, 186.75761414, 296.19091797, 231.27906799],
    [22.73153877, 92.02596283, 135.5695343, 208.80291748],
], np.float32)

DELTAS = np.array([
    [0.47861834, 0.13992102, 0.14961673, 0.71495209],
    [0.29915856, -0.35664671, 0.89018666, 0.70815367],
    [-0.03852064, 0.44466892, 0.49492538, 0.71409376],
    [0.28052918, 0.02184832, 0.65289006, 1.05060139],
    [-0.38172557, -0.08533806, -0.60335309, 0.79052375],
], np.float32)

GT_DECODED = np.array([
    [206.949539, -30.715202, 297.387665, 244.448486],
    [143.871216, -83.342888, 290.502289, 121.053398],
    [177.430283, 198.666245, 196.295273, 228.703079],
    [152.251892, 145.431564, 387.215454, 274.594238],
    [5.062420, 11.040955, 66.328903, 269.686218],
], np.float32)


def test_decode_golden_caffe2():
    out = decode_boxes(jnp.asarray(DELTAS), jnp.asarray(BBOX),
                       weights=(1.0, 1.0, 1.0, 1.0), plus_one=True)
    np.testing.assert_allclose(np.asarray(out), GT_DECODED, atol=1e-3)


def test_encode_decode_roundtrip():
    rng = np.random.RandomState(0)
    props = rng.uniform(0, 200, (16, 4)).astype(np.float32)
    props[:, 2:] = props[:, :2] + rng.uniform(5, 100, (16, 2))
    gts = rng.uniform(0, 200, (16, 4)).astype(np.float32)
    gts[:, 2:] = gts[:, :2] + rng.uniform(5, 100, (16, 2))
    deltas = encode_boxes(jnp.asarray(gts), jnp.asarray(props))
    rec = decode_boxes(deltas, jnp.asarray(props))
    np.testing.assert_allclose(np.asarray(rec), gts, atol=1e-2)


def test_cxcywh_roundtrip():
    b = jnp.asarray(BBOX)
    np.testing.assert_allclose(np.asarray(cxcywh_to_xyxy(xyxy_to_cxcywh(b))),
                               BBOX, atol=1e-4)


def test_iou_hand_computed():
    a = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.asarray([[5.0, 5.0, 15.0, 15.0], [20.0, 20.0, 30.0, 30.0]])
    iou = np.asarray(pairwise_iou(a, b))
    np.testing.assert_allclose(iou, [[25.0 / 175.0, 0.0]], atol=1e-6)
    # +1 (VOC) convention: overlap 6x6, areas 11x11.
    iou1 = np.asarray(pairwise_iou(a, b, plus_one=True))
    np.testing.assert_allclose(iou1[0, 0], 36.0 / (121 + 121 - 36), atol=1e-6)


def test_giou_identity_and_disjoint():
    a = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    g_same = np.asarray(pairwise_giou(a, a))
    np.testing.assert_allclose(g_same, [[1.0]], atol=1e-6)
    b = jnp.asarray([[10.0, 10.0, 20.0, 20.0]])
    # Touching corners: iou 0, hull 400, union 200 → giou = -0.5
    g = np.asarray(pairwise_giou(a, b))
    np.testing.assert_allclose(g, [[-0.5]], atol=1e-6)
    e = np.asarray(elementwise_giou(a, b))
    np.testing.assert_allclose(e, [-0.5], atol=1e-6)


def test_clip_to_image():
    b = jnp.asarray([[-5.0, -3.0, 120.0, 90.0]])
    out = np.asarray(clip_to_image(b, (80, 100)))
    np.testing.assert_allclose(out, [[0.0, 0.0, 100.0, 80.0]])
