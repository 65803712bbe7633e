"""Still-image dataset inference + evaluation.

The reference evaluates its generic datasets (COCO/VOC/Cityscapes) through
the same test loop with dataset-specific evaluators
(``mega_core/data/datasets/evaluation/{coco,voc,cityscapes}``); this is
the equivalent for the COCO-/VOC-/Cityscapes adapters in
``data/{coco_voc,cityscapes}.py``: per-image detection with the classic
single-frame detectors, then the matching evaluator (COCO-exact mAP for
coco_*/cityscapes_*, VOC AP for voc_*).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.transforms import frame_bucket, resize_scale, transform_frame


def run_inference_still(model, variables, dataset, *, min_size: int = 600,
                        max_size: int = 1000, logger=None,
                        max_images: Optional[int] = None,
                        score_thresh: float = 0.05, evaluator: str = "voc"):
    """Per-image inference over a still-image dataset.

    ``model`` must be a single-frame detector (GeneralizedRCNN or
    RetinaNet — both share the (images, image_hw, train=False) call).
    Returns (predictions, gt_list, results)."""
    predictions, gt_list = [], []
    _cache = {}

    def detect(img, hw):
        key = img.shape
        if key not in _cache:
            _cache[key] = jax.jit(lambda v, c, e: model.apply(
                v, c, (e[0], e[1]), train=False))
        return _cache[key](variables, img, hw)

    n = len(dataset)
    if max_images is not None:
        n = min(n, max_images)
    for i in range(n):
        anno = dataset.get_groundtruth(i)
        scale = resize_scale(anno.height, anno.width, min_size, max_size)
        bucket = frame_bucket(anno.height, anno.width, min_size, max_size)
        img = dataset.load_image(dataset.image_path(i))
        frame = transform_frame(img, scale, False, bucket)
        rh = round(anno.height * scale)
        rw = round(anno.width * scale)
        hw = jnp.asarray([rh, rw], jnp.float32)

        dets = detect(jnp.asarray(frame)[None], hw)
        valid = np.asarray(dets.valid[0])
        scores = np.asarray(dets.scores[0])
        keep = valid & (scores > score_thresh)
        predictions.append({
            "boxes": np.asarray(dets.boxes[0])[keep] / scale,
            "scores": scores[keep],
            "labels": np.asarray(dets.labels[0])[keep],
        })
        gt_list.append({"boxes": anno.boxes, "labels": anno.labels})
        if logger and (i + 1) % 50 == 0:
            logger.info(f"[still] {i + 1}/{n} images")

    num_classes = len(dataset.classes) - 1
    if evaluator in ("coco", "cityscapes"):
        from ..evaluation.coco_eval import evaluate_coco
        results = evaluate_coco(gt_list, predictions, num_classes)
        results["ap50"] = results["AP50"]
    else:
        from ..data.coco_voc import evaluate_still
        results = evaluate_still(dataset, predictions[: len(gt_list)],
                                 num_classes=num_classes)
        # evaluate_still reads the FULL dataset GT; restrict to what ran
        if max_images is not None and max_images < len(dataset):
            from ..evaluation.vid_eval import calc_ap, calc_prec_rec
            prec, rec = calc_prec_rec(gt_list, predictions, None, 0.5,
                                      (0.0, 1.0), num_classes)
            results = {"ap50": float(np.nanmean(calc_ap(prec, rec)[1:]))}
    if logger:
        logger.info(f"[still/{evaluator}] results: "
                    + ", ".join(f"{k}={v:.4f}" for k, v in results.items()
                                if isinstance(v, float)))
    return predictions, gt_list, results
