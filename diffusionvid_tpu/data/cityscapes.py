"""Cityscapes instance-detection dataset adapter.

Replaces the reference's Cityscapes dataset + evaluator
(``mega_core/data/datasets/cityscapes.py`` and its
``evaluation/cityscapes`` wrapper around cityscapesscripts): reads the
standard ``gtFine`` polygon JSONs, converts the 8 instance-level classes
to boxes (polygon extents, the reference's ``_poly2box``-style handling),
and evaluates with the COCO-exact numpy mAP (evaluation/coco_eval.py) —
the metric Cityscapes detection papers report.

Expected layout (official):
    <root>/leftImg8bit/<split>/<city>/<name>_leftImg8bit.png
    <root>/gtFine/<split>/<city>/<name>_gtFine_polygons.json
"""

from __future__ import annotations

import glob
import json
import os
from typing import List

import numpy as np

from .vid_dataset import FrameAnno

# the 8 instance classes, in cityscapesscripts order
CITYSCAPES_CLASSES = (
    "__background__",
    "person", "rider", "car", "truck", "bus", "train", "motorcycle",
    "bicycle",
)
_LABEL = {c: i for i, c in enumerate(CITYSCAPES_CLASSES)}


class CityscapesDataset:
    """Boxes-from-polygons Cityscapes detection dataset."""

    def __init__(self, root: str, split: str = "val",
                 filter_empty: bool = True):
        self.root = root
        self.classes = CITYSCAPES_CLASSES
        pattern = os.path.join(root, "gtFine", split, "*",
                               "*_gtFine_polygons.json")
        self.names: List[str] = []
        self.annos: List[FrameAnno] = []
        for jf in sorted(glob.glob(pattern)):
            anno = self._parse(jf)
            if filter_empty and not len(anno.labels):
                continue
            city = os.path.basename(os.path.dirname(jf))
            stem = os.path.basename(jf).replace("_gtFine_polygons.json", "")
            self.names.append(os.path.join(
                "leftImg8bit", split, city, f"{stem}_leftImg8bit.png"))
            self.annos.append(anno)

    @staticmethod
    def _parse(path: str) -> FrameAnno:
        with open(path) as f:
            data = json.load(f)
        h, w = int(data["imgHeight"]), int(data["imgWidth"])
        boxes, labels = [], []
        for obj in data.get("objects", []):
            name = obj["label"]
            # "<cls>group" labels mark crowds — skipped like COCO iscrowd
            if name.endswith("group"):
                continue
            if name not in _LABEL or _LABEL[name] == 0:
                continue
            poly = np.asarray(obj["polygon"], np.float32).reshape(-1, 2)
            if len(poly) < 3:
                continue
            x1, y1 = poly.min(axis=0)
            x2, y2 = poly.max(axis=0)
            x1, x2 = np.clip([x1, x2], 0, w - 1)
            y1, y2 = np.clip([y1, y2], 0, h - 1)
            if x2 <= x1 or y2 <= y1:
                continue
            boxes.append([x1, y1, x2, y2])
            labels.append(_LABEL[name])
        return FrameAnno(np.asarray(boxes, np.float32).reshape(-1, 4),
                         np.asarray(labels, np.int32), h, w)

    def __len__(self):
        return len(self.names)

    def image_path(self, idx: int) -> str:
        return os.path.join(self.root, self.names[idx])

    def load_image(self, path: str) -> np.ndarray:
        import cv2
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32)

    def get_groundtruth(self, idx: int) -> FrameAnno:
        return self.annos[idx]

    @property
    def is_video(self):
        return False


def evaluate_cityscapes(dataset, predictions):
    """COCO-exact mAP over the 8 instance classes."""
    from ..evaluation.coco_eval import evaluate_coco

    gt = [{"boxes": a.boxes, "labels": a.labels} for a in dataset.annos]
    return evaluate_coco(gt, predictions,
                         num_classes=len(CITYSCAPES_CLASSES) - 1)
