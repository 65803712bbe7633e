"""COCO-exact mAP (evaluation/coco_eval.py) + Cityscapes adapter tests.

Golden values are hand-derivable tiny cases that pin down COCOeval
semantics: greedy best-IoU matching, 101-point interpolated AP, area-range
ignores, and the no-GT class exclusion.
"""

import json
import os

import numpy as np

from diffusionvid_tpu.data.cityscapes import (
    CITYSCAPES_CLASSES, CityscapesDataset, evaluate_cityscapes)
from diffusionvid_tpu.evaluation.coco_eval import (
    IOU_THRS, _iou_xyxy, _match_image, evaluate_coco)


def test_iou_coco_convention():
    a = np.asarray([[0.0, 0.0, 10.0, 10.0]])
    b = np.asarray([[0.0, 0.0, 10.0, 10.0], [5.0, 0.0, 15.0, 10.0]])
    iou = _iou_xyxy(a, b)
    assert np.isclose(iou[0, 0], 1.0)
    assert np.isclose(iou[0, 1], 50.0 / 150.0)   # no +1 pixel


def test_perfect_detection_ap_one():
    gt = [{"boxes": np.asarray([[10.0, 10.0, 50.0, 50.0]]),
           "labels": np.asarray([1])}]
    pred = [{"boxes": np.asarray([[10.0, 10.0, 50.0, 50.0]]),
             "scores": np.asarray([0.9]), "labels": np.asarray([1])}]
    r = evaluate_coco(gt, pred, num_classes=3)
    assert np.isclose(r["AP"], 1.0)
    assert np.isclose(r["AP50"], 1.0) and np.isclose(r["AP75"], 1.0)
    # classes 2,3 have no GT → excluded from the mean, not zeros
    assert np.isclose(r["AR@100"], 1.0)


def test_half_iou_detection_counts_only_below_thresholds():
    # det IoU vs GT = 0.5: counts at t=0.5 only (COCO IoU exactly equals t)
    gt = [{"boxes": np.asarray([[0.0, 0.0, 10.0, 10.0]]),
           "labels": np.asarray([1])}]
    pred = [{"boxes": np.asarray([[0.0, 0.0, 10.0, 5.0]]),   # IoU 0.5
             "scores": np.asarray([0.9]), "labels": np.asarray([1])}]
    r = evaluate_coco(gt, pred, num_classes=1)
    assert np.isclose(r["AP50"], 1.0)
    assert np.isclose(r["AP75"], 0.0)
    assert np.isclose(r["AP"], 0.1)   # 1 of 10 thresholds

def test_false_positive_halves_interpolated_ap():
    # one GT, matched at rank 2 behind a higher-scored FP:
    # precision at recall>=0 is 1/2 → AP50 = 0.5
    gt = [{"boxes": np.asarray([[0.0, 0.0, 10.0, 10.0]]),
           "labels": np.asarray([1])}]
    pred = [{"boxes": np.asarray([[50.0, 50.0, 60.0, 60.0],
                                  [0.0, 0.0, 10.0, 10.0]]),
             "scores": np.asarray([0.95, 0.9]),
             "labels": np.asarray([1, 1])}]
    r = evaluate_coco(gt, pred, num_classes=1)
    assert np.isclose(r["AP50"], 0.5)


def test_greedy_matching_prefers_best_iou():
    scores, tp, ig, n_gt = _match_image(
        det_boxes=np.asarray([[0.0, 0.0, 10.0, 10.0]]),
        det_scores=np.asarray([0.9]),
        gt_boxes=np.asarray([[0.0, 0.0, 10.0, 8.0],     # IoU 0.8
                             [0.0, 0.0, 10.0, 10.0]]),  # IoU 1.0
        gt_ignore=np.asarray([False, False]),
        max_dets=100)
    assert n_gt == 2 and tp[:, 0].all()


def test_area_range_ignore():
    # a small GT is ignored in the "large" range; its matching det too
    gt = [{"boxes": np.asarray([[0.0, 0.0, 10.0, 10.0],          # area 100
                                [0.0, 0.0, 200.0, 200.0]]),      # area 4e4
           "labels": np.asarray([1, 1])}]
    pred = [{"boxes": np.asarray([[0.0, 0.0, 10.0, 10.0],
                                  [0.0, 0.0, 200.0, 200.0]]),
             "scores": np.asarray([0.9, 0.8]),
             "labels": np.asarray([1, 1])}]
    r = evaluate_coco(gt, pred, num_classes=1)
    assert np.isclose(r["AP"], 1.0)
    assert np.isclose(r["APlarge"], 1.0)
    assert np.isclose(r["APsmall"], 1.0)   # the 10x10 GT


def _write_cityscapes(tmp_path):
    root = tmp_path / "cs"
    d = root / "gtFine" / "val" / "testcity"
    os.makedirs(d)
    data = {
        "imgHeight": 128, "imgWidth": 256,
        "objects": [
            {"label": "car",
             "polygon": [[10, 20], [60, 20], [60, 50], [10, 50]]},
            {"label": "person",
             "polygon": [[100, 30], [120, 30], [120, 90], [100, 90]]},
            {"label": "cargroup",    # crowd → skipped
             "polygon": [[0, 0], [5, 0], [5, 5]]},
            {"label": "sky",         # not an instance class
             "polygon": [[0, 0], [255, 0], [255, 10]]},
        ],
    }
    with open(d / "aaa_000000_gtFine_polygons.json", "w") as f:
        json.dump(data, f)
    return str(root)


def test_cityscapes_dataset(tmp_path):
    root = _write_cityscapes(tmp_path)
    ds = CityscapesDataset(root, split="val")
    assert len(ds) == 1
    a = ds.get_groundtruth(0)
    assert a.height == 128 and a.width == 256
    assert len(a.labels) == 2
    assert set(a.labels.tolist()) == {CITYSCAPES_CLASSES.index("car"),
                                      CITYSCAPES_CLASSES.index("person")}
    np.testing.assert_allclose(a.boxes[0], [10, 20, 60, 50])
    assert ds.image_path(0).endswith(
        "leftImg8bit/val/testcity/aaa_000000_leftImg8bit.png")


def test_cityscapes_eval_perfect(tmp_path):
    root = _write_cityscapes(tmp_path)
    ds = CityscapesDataset(root, split="val")
    a = ds.get_groundtruth(0)
    preds = [{"boxes": a.boxes, "scores": np.ones(len(a.labels)),
              "labels": a.labels}]
    r = evaluate_cityscapes(ds, preds)
    assert np.isclose(r["AP"], 1.0)


def test_area_ignored_gt_matched_once_only():
    """COCOeval re-matches only iscrowd GT ('gtm>0 and not iscrowd'); an
    area-range-ignored NON-crowd GT absorbs one detection — a second
    detection on it is a plain unmatched detection (FP), not ignored."""
    gt = np.asarray([[0.0, 0.0, 10.0, 10.0]])
    dets = np.asarray([[0.0, 0.0, 10.0, 10.0], [0.5, 0.0, 10.5, 10.0]])
    scores = np.asarray([0.9, 0.8])
    ignore = np.asarray([True])
    _, tp, ig, n_gt = _match_image(dets, scores, gt, ignore, 100)
    assert n_gt == 0
    # first det matches the ignored GT → ignored; second finds no free GT
    assert ig[0, 0] and not tp[0, 0]
    assert not ig[0, 1] and not tp[0, 1]


def test_crowd_gt_rematched():
    """With an explicit iscrowd flag the same GT absorbs both detections."""
    gt = np.asarray([[0.0, 0.0, 10.0, 10.0]])
    dets = np.asarray([[0.0, 0.0, 10.0, 10.0], [0.5, 0.0, 10.5, 10.0]])
    scores = np.asarray([0.9, 0.8])
    ignore = np.asarray([True])
    crowd = np.asarray([True])
    _, tp, ig, _ = _match_image(dets, scores, gt, ignore, 100,
                                gt_crowd=crowd)
    assert ig[0, 0] and ig[0, 1]
