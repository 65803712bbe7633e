"""NMS golden tests vs the Caffe2 numbers from the reference
(``tests/test_nms.py``: UtilsNMSTest.TestNMS)."""

import numpy as np
import jax.numpy as jnp

from diffusionvid_tpu.ops import nms_mask, batched_nms_mask

BOXES = np.array([
    [10, 10, 50, 60],
    [11, 12, 48, 60],
    [8, 9, 40, 50],
    [100, 100, 150, 140],
    [99, 110, 155, 139],
], np.float32)
SCORES = np.array([0.5, 0.7, 0.6, 0.9, 0.8], np.float32)


def test_nms_golden_caffe2():
    # The reference kernel uses the +1-pixel IoU convention.
    cases = {0.1: [1, 3], 0.3: [1, 3], 0.5: [1, 3],
             0.8: [1, 2, 3, 4], 0.9: [0, 1, 2, 3, 4]}
    for thresh, expected in cases.items():
        keep = np.asarray(nms_mask(jnp.asarray(BOXES), jnp.asarray(SCORES),
                                   thresh, plus_one=True))
        np.testing.assert_array_equal(np.sort(np.nonzero(keep)[0]), expected)


def test_nms_respects_valid_mask():
    valid = jnp.asarray([True, False, True, True, True])
    keep = np.asarray(nms_mask(jnp.asarray(BOXES), jnp.asarray(SCORES), 0.5,
                               valid=valid, plus_one=True))
    assert not keep[1]
    # With box 1 gone, box 2 still overlaps box 0 heavily; 0 wins? No — 2 has
    # higher score (0.6 > 0.5), so 2 suppresses 0 at IoU(0,2) > 0.5.
    np.testing.assert_array_equal(np.sort(np.nonzero(keep)[0]), [2, 3])


def test_batched_nms_separates_classes():
    boxes = jnp.asarray(np.tile(BOXES[:2], (2, 1)))  # same two boxes twice
    scores = jnp.asarray([0.5, 0.7, 0.5, 0.7])
    labels = jnp.asarray([1, 1, 2, 2])
    keep = np.asarray(batched_nms_mask(boxes, scores, labels, 0.5, plus_one=True))
    # One survivor per class (the higher-scoring one).
    np.testing.assert_array_equal(keep, [False, True, False, True])
