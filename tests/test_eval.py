"""Evaluator + seq-NMS tests with hand-computable scenarios."""

import numpy as np

from diffusionvid_tpu.evaluation import evaluate_vid, calc_ap
from diffusionvid_tpu.engine.seq_nms import seq_nms_video, seq_nms_class


def _frame(boxes, labels, scores=None):
    d = {"boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
         "labels": np.asarray(labels, np.int64)}
    if scores is not None:
        d["scores"] = np.asarray(scores, np.float32)
    return d


def test_perfect_detection_ap1():
    gt = [_frame([[10, 10, 50, 50]], [3]), _frame([[20, 20, 60, 60]], [5])]
    pred = [_frame([[10, 10, 50, 50]], [3], [0.9]),
            _frame([[20, 20, 60, 60]], [5], [0.8])]
    res = evaluate_vid(gt, pred)
    assert abs(res["ap50"] - 1.0) < 1e-6
    assert abs(res["corloc"] - 1.0) < 1e-6


def test_miss_and_false_positive():
    gt = [_frame([[10, 10, 50, 50]], [3])]
    # one matching pred + one high-scoring FP of the same class
    pred = [_frame([[10, 10, 50, 50], [100, 100, 140, 140]], [3, 3], [0.5, 0.9])]
    res = evaluate_vid(gt, pred)
    # PR: first det (0.9) FP, second TP → prec [0, 1/2], rec [0, 1] → AP 0.5
    assert abs(res["ap50"] - 0.5) < 1e-6


def test_wrong_class_no_credit():
    gt = [_frame([[10, 10, 50, 50]], [3])]
    pred = [_frame([[10, 10, 50, 50]], [4], [0.9])]
    res = evaluate_vid(gt, pred)
    assert res["ap50"] == 0.0 or np.isnan(res["ap50"]) is False and res["ap50"] < 1e-6


def test_motion_buckets():
    gt = [_frame([[10, 10, 50, 50], [60, 60, 90, 90]], [3, 3])]
    pred = [_frame([[10, 10, 50, 50], [60, 60, 90, 90]], [3, 3], [0.9, 0.8])]
    motion = [np.asarray([0.95, 0.5])]  # one slow, one fast object
    res = evaluate_vid(gt, pred, motion_ious=motion, motion_specific=True)
    assert abs(res["per_motion"]["all"] - 1.0) < 1e-6
    assert abs(res["per_motion"]["slow"] - 1.0) < 1e-6
    assert abs(res["per_motion"]["fast"] - 1.0) < 1e-6


def test_seq_nms_rescores_chain():
    # A stable 3-frame chain; middle frame score low → lifted to chain mean.
    box = [10, 10, 50, 50]
    frames = [
        _frame([box], [2], [0.9]),
        _frame([box], [2], [0.1]),
        _frame([box], [2], [0.8]),
    ]
    out = seq_nms_video(frames, num_classes=5)
    mean = (0.9 + 0.1 + 0.8) / 3
    for f in out:
        assert len(f["scores"]) == 1
        assert abs(float(f["scores"][0]) - mean) < 1e-5


def test_seq_nms_suppresses_overlaps():
    box = [10, 10, 50, 50]
    near = [12, 12, 52, 52]   # overlaps chain box → suppressed
    far = [200, 200, 240, 240]
    keep, scores = seq_nms_class(
        [np.asarray([box, near, far], np.float32)] * 2,
        [np.asarray([0.9, 0.5, 0.4], np.float32)] * 2)
    for f in range(2):
        assert keep[f][0]          # chain member kept
        assert not keep[f][1]      # overlap suppressed
        assert keep[f][2]          # far box kept (own weak chain)
