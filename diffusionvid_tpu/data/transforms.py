"""Image transforms for the static-shape pipeline.

Replaces the reference's type-aware transform stack
(``mega_core/data/transforms/transforms.py``): the resize scale and flip
decision are computed once from the current frame and reused for every
reference frame of the sample (transforms.py:61-63, 73-87).  Unlike the
reference, images are padded host-side into one of two static orientation
buckets (landscape 608×1024 / portrait 1024×608 at the default 600/1000
min/max sizes) so every device computation has a fixed shape.
Normalization lives in the model (DiffusionDetArch.normalize).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def resize_scale(height: int, width: int, min_size: int = 600,
                 max_size: int = 1000) -> float:
    """maskrcnn-style scale: short side → min_size unless the long side
    would exceed max_size (transforms.py Resize.get_size semantics)."""
    short, long = min(height, width), max(height, width)
    scale = min_size / short
    if long * scale > max_size:
        scale = max_size / long
    return scale


def bucket_shape(min_size: int = 600, max_size: int = 1000,
                 divisor: int = 32) -> Tuple[int, int]:
    """Static (short, long) padded extents covering any resized image."""
    rup = lambda v: ((v + divisor - 1) // divisor) * divisor
    return rup(min_size), rup(max_size)


def resize_image(img: np.ndarray, scale: float) -> np.ndarray:
    import cv2
    h, w = img.shape[:2]
    nh, nw = int(round(h * scale)), int(round(w * scale))
    return cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)


def pad_to(img: np.ndarray, shape_hw: Tuple[int, int]) -> np.ndarray:
    """Zero-pad bottom/right to the static bucket (collate_batch.py:25-35
    size-divisible padding, taken to a fixed extent)."""
    h, w = img.shape[:2]
    ph, pw = shape_hw
    assert h <= ph and w <= pw, (img.shape, shape_hw)
    out = np.zeros((ph, pw, img.shape[2]), img.dtype)
    out[:h, :w] = img
    return out


def transform_frame(img: np.ndarray, scale: float, flip: bool,
                    bucket_hw: Tuple[int, int]) -> np.ndarray:
    """resize → optional hflip → pad to the bucket. Returns [H,W,3]."""
    img = resize_image(img, scale)
    if flip:
        img = img[:, ::-1]
    return pad_to(np.ascontiguousarray(img), bucket_hw)


def frame_bucket(height: int, width: int, min_size: int = 600,
                 max_size: int = 1000, divisor: int = 32) -> Tuple[int, int]:
    """Orientation-dependent static bucket for this image."""
    s, l = bucket_shape(min_size, max_size, divisor)
    return (s, l) if width >= height else (l, s)
