"""COCO- and VOC-format still-image dataset adapters.

Replaces the reference's inherited generic datasets
(``mega_core/data/datasets/{coco,voc}.py`` + their evaluators) for
still-image training/eval outside ILSVRC.  pycocotools is not available in
this environment, so the COCO JSON is parsed directly (the format is plain
JSON) and evaluation reuses our VOC-style AP machinery
(evaluation/vid_eval.calc_prec_rec / calc_ap) — matching the reference's
VOC evaluator semantics; COCO-mAP@[.5:.95] averaging is provided on top.
"""

from __future__ import annotations

import json
import os
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional

import numpy as np

from .vid_dataset import FrameAnno

VOC_CLASSES = (
    "__background__",
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
)


class COCODataset:
    """Minimal COCO-format detection dataset (instances JSON)."""

    def __init__(self, annotation_file: str, image_dir: str,
                 filter_empty: bool = True):
        with open(annotation_file) as f:
            coco = json.load(f)
        self.image_dir = image_dir
        cats = sorted(coco["categories"], key=lambda c: c["id"])
        # contiguous labels 1..K (background 0), like the reference's
        # json_category_id_to_contiguous_id map
        self.cat_to_label = {c["id"]: i + 1 for i, c in enumerate(cats)}
        self.classes = ("__background__",) + tuple(c["name"] for c in cats)

        anns_by_img: Dict[int, list] = {}
        for a in coco.get("annotations", []):
            if a.get("iscrowd", 0):
                continue
            anns_by_img.setdefault(a["image_id"], []).append(a)

        self.images = []
        self.annos: List[FrameAnno] = []
        for img in coco["images"]:
            anns = anns_by_img.get(img["id"], [])
            if filter_empty and not anns:
                continue
            boxes, labels = [], []
            for a in anns:
                x, y, w, h = a["bbox"]
                boxes.append([x, y, x + w, y + h])
                labels.append(self.cat_to_label[a["category_id"]])
            self.images.append(img)
            self.annos.append(FrameAnno(
                np.asarray(boxes, np.float32).reshape(-1, 4),
                np.asarray(labels, np.int32),
                int(img["height"]), int(img["width"])))

    def __len__(self):
        return len(self.images)

    def image_path(self, idx: int) -> str:
        return os.path.join(self.image_dir, self.images[idx]["file_name"])

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


class VOCDataset:
    """PASCAL-VOC layout dataset (JPEGImages/Annotations/ImageSets)."""

    def __init__(self, root: str, split: str = "trainval",
                 filter_empty: bool = True):
        self.root = root
        index = os.path.join(root, "ImageSets", "Main", f"{split}.txt")
        with open(index) as f:
            names = [l.strip() for l in f if l.strip()]
        self.classes = VOC_CLASSES
        cls_map = {c: i for i, c in enumerate(VOC_CLASSES)}

        self.names = []
        self.annos: List[FrameAnno] = []
        for n in names:
            anno = self._parse(os.path.join(root, "Annotations", f"{n}.xml"),
                               cls_map)
            if filter_empty and not len(anno.labels):
                continue
            self.names.append(n)
            self.annos.append(anno)

    @staticmethod
    def _parse(path: str, cls_map) -> FrameAnno:
        root = ET.parse(path).getroot()
        size = root.find("size")
        h = int(size.find("height").text)
        w = int(size.find("width").text)
        boxes, labels = [], []
        for obj in root.findall("object"):
            if obj.find("difficult") is not None and \
                    int(obj.find("difficult").text):
                continue
            name = obj.find("name").text.lower().strip()
            if name not in cls_map:
                continue
            bb = obj.find("bndbox")
            # VOC 1-based pixel coords → 0-based (reference voc.py)
            boxes.append([float(bb.find("xmin").text) - 1,
                          float(bb.find("ymin").text) - 1,
                          float(bb.find("xmax").text) - 1,
                          float(bb.find("ymax").text) - 1])
            labels.append(cls_map[name])
        return FrameAnno(np.asarray(boxes, np.float32).reshape(-1, 4),
                         np.asarray(labels, np.int32), h, w)

    def __len__(self):
        return len(self.names)

    def image_path(self, idx: int) -> str:
        return os.path.join(self.root, "JPEGImages", f"{self.names[idx]}.jpg")

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


def evaluate_still(dataset, predictions, num_classes: Optional[int] = None,
                   iou_thresholds=(0.5,)):
    """Evaluate still-image predictions with VOC-style AP at the given IoU
    thresholds; returns {"ap50", "map" (mean over thresholds), per-thr}.
    Works for both COCO- and VOC-adapted datasets."""
    from ..evaluation.vid_eval import calc_prec_rec, calc_ap

    k = num_classes or (len(dataset.classes) - 1)
    gt = [{"boxes": a.boxes, "labels": a.labels} for a in dataset.annos]
    out = {}
    aps = []
    for thr in iou_thresholds:
        prec, rec = calc_prec_rec(gt, predictions, None, thr, (0.0, 1.0), k)
        ap = calc_ap(prec, rec)
        m = float(np.nanmean(ap[1:]))
        out[f"ap@{thr:.2f}"] = m
        aps.append(m)
    out["map"] = float(np.mean(aps))
    out["ap50"] = out.get("ap@0.50", aps[0])
    return out
