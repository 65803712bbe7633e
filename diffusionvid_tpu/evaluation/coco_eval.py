"""COCO-exact detection mAP in pure numpy.

The reference evaluates COCO datasets through pycocotools' ``COCOeval``
(``mega_core/data/datasets/evaluation/coco/coco_eval.py``); pycocotools is
not in this environment, so this module re-implements COCOeval's bbox
algorithm exactly:

  * greedy per-(image, category) matching in descending score order, each
    detection taking the not-yet-matched GT with the highest IoU ≥ t
    (ties keep the earlier GT, as in ``COCOeval.evaluateImg``);
  * IoU thresholds 0.50:0.05:0.95, 101 recall points 0:0.01:1;
  * area ranges all/small/medium/large with GT-ignore semantics (ignored
    GT absorb detections without counting; out-of-range unmatched
    detections are ignored, ``COCOeval`` ``aRng`` handling);
  * maxDets=100 per image; precision envelope (monotone non-increasing)
    before sampling at the recall grid;
  * classes with no GT are excluded from the mean (COCOeval's -1).

IoU here is the COCO convention (no +1 pixel), unlike the ImageNet-VID
evaluator's +1 convention (evaluation/vid_eval.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RANGES = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}


def _iou_xyxy(det: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """[D,4] × [G,4] → [D,G] IoU, COCO convention (w = x2 - x1)."""
    if len(det) == 0 or len(gt) == 0:
        return np.zeros((len(det), len(gt)))
    ix1 = np.maximum(det[:, None, 0], gt[None, :, 0])
    iy1 = np.maximum(det[:, None, 1], gt[None, :, 1])
    ix2 = np.minimum(det[:, None, 2], gt[None, :, 2])
    iy2 = np.minimum(det[:, None, 3], gt[None, :, 3])
    iw = np.clip(ix2 - ix1, 0, None)
    ih = np.clip(iy2 - iy1, 0, None)
    inter = iw * ih
    a_d = (det[:, 2] - det[:, 0]) * (det[:, 3] - det[:, 1])
    a_g = (gt[:, 2] - gt[:, 0]) * (gt[:, 3] - gt[:, 1])
    union = a_d[:, None] + a_g[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def _match_image(det_boxes, det_scores, gt_boxes, gt_ignore, max_dets,
                 gt_crowd=None):
    """COCOeval.evaluateImg for one (image, category, area range).

    ``gt_ignore`` marks GT outside the area range (detections matching it
    are neither TP nor FP); ``gt_crowd`` marks iscrowd GT, which COCOeval
    allows to be matched by MULTIPLE detections ('gtm>0 and not iscrowd').
    An area-ignored non-crowd GT is matchable once only — a second
    detection on it must fall through to other GT or count as FP.  Our
    datasets carry no crowd annotations, so gt_crowd defaults to none.

    Returns (scores [D], tp [T,D] bool, ignore_det [T,D] bool, n_gt)."""
    order = np.argsort(-det_scores, kind="mergesort")[:max_dets]
    det_boxes = det_boxes[order]
    det_scores = det_scores[order]
    d = len(det_boxes)
    g = len(gt_boxes)
    t = len(IOU_THRS)
    tp = np.zeros((t, d), bool)
    ig = np.zeros((t, d), bool)
    n_gt = int((~gt_ignore).sum())
    if gt_crowd is None:
        gt_crowd = np.zeros(g, bool)
    if g:
        # non-ignored GT first (COCOeval sorts gt by _ignore)
        gt_order = np.argsort(gt_ignore, kind="mergesort")
        gt_boxes = gt_boxes[gt_order]
        gt_ignore = gt_ignore[gt_order]
        gt_crowd = gt_crowd[gt_order]
        ious = _iou_xyxy(det_boxes, gt_boxes)
        for ti, thr in enumerate(IOU_THRS):
            taken = np.zeros(g, bool)
            for di in range(d):
                best = -1
                best_iou = min(thr, 1 - 1e-10)
                for gi in range(g):
                    if taken[gi] and not gt_crowd[gi]:
                        continue
                    # once matched to a real GT, never downgrade to ignore
                    if best > -1 and not gt_ignore[best] and gt_ignore[gi]:
                        break
                    if ious[di, gi] < best_iou:
                        continue
                    best_iou = ious[di, gi]
                    best = gi
                if best == -1:
                    continue
                taken[best] = True
                if gt_ignore[best]:
                    ig[ti, di] = True
                else:
                    tp[ti, di] = True
    return det_scores, tp, ig, n_gt


def evaluate_coco(gt_list: List[dict], pred_list: List[dict],
                  num_classes: int, max_dets: int = 100) -> Dict[str, float]:
    """gt_list / pred_list: per-image dicts with "boxes" [N,4] xyxy and
    "labels" [N] in 1..K (preds also "scores").  Returns the standard COCO
    summary: AP, AP50, AP75, APsmall/medium/large, AR@{1,10,100}."""
    assert len(gt_list) == len(pred_list)
    t, r = len(IOU_THRS), len(REC_THRS)
    results = {}
    # precision[T, R, K, A]; recall[T, K, A]
    precision = {a: np.full((t, r, num_classes), -1.0) for a in AREA_RANGES}
    recall = {a: np.full((t, num_classes), -1.0) for a in AREA_RANGES}

    for cls in range(1, num_classes + 1):
        per_img = []
        for gt, pr in zip(gt_list, pred_list):
            gsel = np.asarray(gt["labels"]) == cls
            gb = np.asarray(gt["boxes"], np.float64).reshape(-1, 4)[gsel]
            psel = np.asarray(pr["labels"]) == cls
            pb = np.asarray(pr["boxes"], np.float64).reshape(-1, 4)[psel]
            ps = np.asarray(pr["scores"], np.float64).reshape(-1)[psel]
            per_img.append((pb, ps, gb))

        for aname, (lo, hi) in AREA_RANGES.items():
            scores_all, tp_all, ig_all = [], [], []
            total_gt = 0
            for pb, ps, gb in per_img:
                areas = ((gb[:, 2] - gb[:, 0]) * (gb[:, 3] - gb[:, 1])
                         if len(gb) else np.zeros((0,)))
                gt_ignore = (areas < lo) | (areas > hi)
                s, tp, ig, n_gt = _match_image(pb, ps, gb, gt_ignore,
                                               max_dets)
                # unmatched dets outside the area range are ignored
                if len(s):
                    da = (pb[np.argsort(-ps, kind="mergesort")[:max_dets]])
                    dareas = (da[:, 2] - da[:, 0]) * (da[:, 3] - da[:, 1])
                    out = (dareas < lo) | (dareas > hi)
                    ig = ig | (out[None, :] & ~tp)
                scores_all.append(s)
                tp_all.append(tp)
                ig_all.append(ig)
                total_gt += n_gt
            if total_gt == 0:
                continue
            scores = np.concatenate(scores_all) if scores_all else np.zeros(0)
            order = np.argsort(-scores, kind="mergesort")
            tp = (np.concatenate(tp_all, axis=1)[:, order]
                  if scores_all else np.zeros((t, 0), bool))
            ig = (np.concatenate(ig_all, axis=1)[:, order]
                  if scores_all else np.zeros((t, 0), bool))

            for ti in range(t):
                keep = ~ig[ti]
                tps = np.cumsum(tp[ti][keep])
                fps = np.cumsum(~tp[ti][keep])
                rc = tps / total_gt
                pr = tps / np.maximum(tps + fps, 1e-12)
                recall[aname][ti, cls - 1] = rc[-1] if len(rc) else 0.0
                # precision envelope then sample at the recall grid
                pr = pr.tolist()
                for i in range(len(pr) - 1, 0, -1):
                    pr[i - 1] = max(pr[i - 1], pr[i])
                inds = np.searchsorted(rc, REC_THRS, side="left")
                q = np.zeros(r)
                for ri, pi in enumerate(inds):
                    if pi < len(pr):
                        q[ri] = pr[pi]
                precision[aname][ti, :, cls - 1] = q

    def mean_valid(x):
        v = x[x > -1]
        return float(v.mean()) if v.size else float("nan")

    results["AP"] = mean_valid(precision["all"])
    results["AP50"] = mean_valid(precision["all"][0])
    results["AP75"] = mean_valid(precision["all"][5])
    results["APsmall"] = mean_valid(precision["small"])
    results["APmedium"] = mean_valid(precision["medium"])
    results["APlarge"] = mean_valid(precision["large"])
    results["AR@100"] = mean_valid(recall["all"])
    return results
