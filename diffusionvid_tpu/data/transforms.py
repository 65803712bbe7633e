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


def transform_frame_to(img: np.ndarray, size_hw: Tuple[int, int], flip: bool,
                       bucket_hw: Tuple[int, int]) -> np.ndarray:
    """Resize to an exact (h, w) → optional hflip → pad to the bucket.
    Used by the SSD-augmented train path, where each frame's augmented
    extent differs by rounding but must land on the sample's static
    target resolution."""
    import cv2
    rh, rw = size_hw
    img = cv2.resize(img, (rw, rh), interpolation=cv2.INTER_LINEAR)
    if flip:
        img = img[:, ::-1]
    return pad_to(np.ascontiguousarray(img), bucket_hw)


def frame_bucket(height: int, width: int, min_size: int = 600,
                 max_size: int = 1000, divisor: int = 32) -> Tuple[int, int]:
    """Orientation-dependent static bucket for this image."""
    s, l = bucket_shape(min_size, max_size, divisor)
    return (s, l) if width >= height else (l, s)


# ---------------------------------------------------------------------------
# SSD-style train augmentation — the LIVE reference INPUT.TRANSFORM path
# (transforms/build.py:67-68 appends TS.SSDAugmentation; the ColorJitter
# composition in build.py:50-65 is commented out upstream).  Pipeline
# (transforms_selsa.py:449-471): PhotometricDistort → Expand(mean-fill) →
# RandomSampleCrop, all on uint8-rounded RGB before resize.
# ---------------------------------------------------------------------------

def ssd_photometric_distort(img: np.ndarray,
                            rng: np.random.RandomState) -> np.ndarray:
    """PhotometricDistort (transforms_selsa.py:422-446): random brightness,
    then (contrast → HSV saturation/hue) or (HSV saturation/hue → contrast),
    then random channel shuffle.  Every sub-op flips its own coin.
    float32 RGB 0..255 in/out (clipping happens in ConvertToInts at the
    end of ssd_augment)."""
    import cv2

    out = img.astype(np.float32)
    # RandomBrightness(delta=32)
    if rng.randint(2):
        out = out + rng.uniform(-32.0, 32.0)

    def contrast(im):
        # RandomContrast(0.5, 1.5)
        if rng.randint(2):
            return im * rng.uniform(0.5, 1.5)
        # the coin consumes an alpha draw either way in the reference
        rng.uniform(0.5, 1.5)
        return im

    def satur_hue(im):
        # ConvertColor RGB→HSV on the float image (H in degrees, V on the
        # input 0..255 scale) → RandomSaturation / RandomHue → back
        hsv = cv2.cvtColor(im, cv2.COLOR_RGB2HSV)
        if rng.randint(2):
            hsv[:, :, 1] *= rng.uniform(0.5, 1.5)
        else:
            rng.uniform(0.5, 1.5)
        if rng.randint(2):
            h = hsv[:, :, 0] + rng.uniform(-18.0, 18.0)
            h[h > 360.0] -= 360.0
            h[h < 0.0] += 360.0
            hsv[:, :, 0] = h
        else:
            rng.uniform(-18.0, 18.0)
        return cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)

    if rng.randint(2):
        out = satur_hue(contrast(out))      # pd[:-1]: contrast first
    else:
        out = contrast(satur_hue(out))      # pd[1:]: contrast last

    # RandomLightingNoise: random channel permutation
    perms = ((0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1), (2, 1, 0))
    if rng.randint(2):
        out = out[:, :, perms[rng.randint(len(perms))]]
    else:
        rng.randint(len(perms))
    return out


def ssd_expand(img: np.ndarray, boxes: np.ndarray,
               rng: np.random.RandomState, mean,
               expand_scale: float = 2.0):
    """Expand (transforms_selsa.py:347-388): paste onto a mean-filled
    canvas up to ``expand_scale``× the size, shifting boxes.  50% skip.
    The reference fills with ``mean[::-1]`` rounded (is_RGB=True) — kept
    verbatim for parity, even when PIXEL_MEAN is already RGB."""
    if rng.randint(2):
        return img, boxes
    h, w = img.shape[:2]
    ratio = rng.uniform(1.0, expand_scale)
    left = int(rng.uniform(0, w * ratio - w))
    top = int(rng.uniform(0, h * ratio - h))
    fill = [round(float(m)) for m in list(mean)[::-1]]
    out = np.empty((int(h * ratio), int(w * ratio), img.shape[2]), img.dtype)
    out[:, :] = np.asarray(fill, img.dtype)
    out[top: top + h, left: left + w] = img
    if len(boxes):
        boxes = boxes.copy()
        boxes[:, :2] += (left, top)
        boxes[:, 2:] += (left, top)
    return out, boxes


_SSD_CROP_MODES = (None, (0.1, None), (0.3, None), (0.7, None), (0.9, None),
                   (None, None))


def ssd_random_sample_crop(img: np.ndarray, boxes: np.ndarray,
                           labels: np.ndarray, rng: np.random.RandomState,
                           crop_pert: float = 0.3, max_rounds: int = 20):
    """RandomSampleCrop (transforms_selsa.py:224-345): aspect-preserving
    window ≥ ``crop_pert``× the width, gated on per-GT IoU with a sampled
    floor; GTs keep membership by box center.  The reference retries modes
    forever; ``max_rounds`` bounds that with the same distribution (mode
    None is an immediate exit with p=1/6 per round)."""
    for _ in range(max_rounds):
        mode = _SSD_CROP_MODES[rng.randint(len(_SSD_CROP_MODES))]
        if mode is None:
            return img, boxes, labels
        min_iou = -np.inf if mode[0] is None else mode[0]
        max_iou = np.inf if mode[1] is None else mode[1]
        h, w = img.shape[:2]
        aspect = float(h) / float(w)
        for _ in range(50):
            cw = rng.uniform(crop_pert * w, w)
            ch = cw * aspect
            left = rng.uniform(0.0, w - cw)
            top = rng.uniform(0.0, h - ch)
            rect = np.array([int(left), int(top),
                             int(left + cw), int(top + ch)])
            if len(boxes):
                ix = (np.minimum(boxes[:, 2], rect[2])
                      - np.maximum(boxes[:, 0], rect[0])).clip(min=0)
                iy = (np.minimum(boxes[:, 3], rect[3])
                      - np.maximum(boxes[:, 1], rect[1])).clip(min=0)
                inter = ix * iy
                area_b = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
                area_r = (rect[2] - rect[0]) * (rect[3] - rect[1])
                iou = inter / np.maximum(area_b + area_r - inter, 1e-9)
                if iou.min() < min_iou or iou.max() > max_iou:
                    continue
                centers = 0.5 * (boxes[:, :2] + boxes[:, 2:])
                keep = ((rect[0] < centers[:, 0]) & (rect[1] < centers[:, 1])
                        & (rect[2] > centers[:, 0]) & (rect[3] > centers[:, 1]))
                if not keep.any():
                    continue
                nb = boxes[keep].copy()
                nb[:, :2] = np.maximum(nb[:, :2], rect[:2]) - rect[:2]
                nb[:, 2:] = np.minimum(nb[:, 2:], rect[2:]) - rect[:2]
                nl = labels[keep]
            else:
                nb, nl = boxes, labels
            return (np.ascontiguousarray(img[rect[1]: rect[3],
                                             rect[0]: rect[2]]), nb, nl)
    return img, boxes, labels


def ssd_augment(img: np.ndarray, boxes: np.ndarray, labels: np.ndarray,
                rng: np.random.RandomState,
                pixel_mean=(123.675, 116.280, 103.530),
                expand_scale: float = 2.0, crop_pert: float = 0.3,
                color: bool = True):
    """SSDAugmentation (transforms_selsa.py:449-480) — the INPUT.TRANSFORM
    train pipeline.  uint8 RGB + xyxy boxes in; uint8 + adjusted
    (boxes, labels) out.  Runs BEFORE resize, as in the reference."""
    out = img.astype(np.float32)
    if color:
        out = ssd_photometric_distort(out, rng)
    out, boxes = ssd_expand(out, boxes, rng, pixel_mean, expand_scale)
    out, boxes, labels = ssd_random_sample_crop(out, boxes, labels, rng,
                                                crop_pert)
    return (np.clip(out, 0, 255).astype(np.uint8),
            np.asarray(boxes, np.float32), labels)


# ---------------------------------------------------------------------------
# Photometric / geometric train augmentation
# (reference transforms.py:101-330 — the commented-out upstream
# composition; kept for parity breadth.  RandomPad / RandomCrop ship
# implemented-but-disabled there, build.py:56-57.)
# ---------------------------------------------------------------------------

def color_jitter(img: np.ndarray, rng: np.random.RandomState,
                 brightness: float = 0.166, contrast: float = 0.5,
                 saturation: float = 0.5, hue: float = 0.05) -> np.ndarray:
    """ColorJitter (transforms.py:101-121): independent per-frame factors,
    torchvision semantics — brightness/contrast/saturation multiply toward
    black/mean/gray, hue rotates in HSV.  uint8 in, uint8 out."""
    import cv2

    out = img.astype(np.float32)
    fb = rng.uniform(max(0.0, 1 - brightness), 1 + brightness)
    out = out * fb
    fc = rng.uniform(max(0.0, 1 - contrast), 1 + contrast)
    mean = out.mean()
    out = mean + (out - mean) * fc
    fs = rng.uniform(max(0.0, 1 - saturation), 1 + saturation)
    gray = out @ np.asarray([0.299, 0.587, 0.114], np.float32)
    out = gray[..., None] + (out - gray[..., None]) * fs
    out = np.clip(out, 0, 255).astype(np.uint8)
    if hue > 0:
        fh = rng.uniform(-hue, hue)            # fraction of a full turn
        hsv = cv2.cvtColor(out, cv2.COLOR_RGB2HSV)
        h = hsv[..., 0].astype(np.int16)       # OpenCV hue ∈ [0, 180)
        hsv[..., 0] = ((h + int(round(fh * 180))) % 180).astype(np.uint8)
        out = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)
    return out


def random_pad(img: np.ndarray, boxes: np.ndarray,
               rng: np.random.RandomState, prob: float = 0.5,
               max_size: float = 1.5):
    """RandomPad (transforms.py:123-155): zero-pad an equal border on all
    sides (up to max_size× each dimension); boxes shift by the padding."""
    if rng.rand() >= prob:
        return img, boxes
    h, w = img.shape[:2]
    ratio = rng.uniform(0.0, max_size)
    padding = int(min(rng.uniform(0, ratio * w), rng.uniform(0, ratio * h)))
    if padding <= 0:
        return img, boxes
    out = np.zeros((h + 2 * padding, w + 2 * padding, img.shape[2]),
                   img.dtype)
    out[padding: padding + h, padding: padding + w] = img
    return out, boxes + padding


def random_crop(img: np.ndarray, boxes: np.ndarray, labels: np.ndarray,
                rng: np.random.RandomState, prob: float = 0.5,
                min_crop_size: float = 0.3, max_crop_size: float = 0.9,
                max_tries: int = 50):
    """RandomCrop (transforms.py:158-244): pick a window that covers a
    randomly chosen GT box's center with IoU above a sampled floor; GTs
    whose centers fall outside the window are dropped.  Returns
    (img, boxes, labels) — unchanged if no valid window is found."""
    if rng.rand() >= prob or len(boxes) == 0:
        return img, boxes, labels
    h, w = img.shape[:2]
    tb = boxes[rng.randint(len(boxes))]
    iou_min = float(rng.choice([0.1, 0.3, 0.5, 0.7, 0.9]))
    mid = (0.5 * (tb[0] + tb[2]), 0.5 * (tb[1] + tb[3]))

    def iou(a, b):
        ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]) + 1)
        iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]) + 1)
        inter = ix * iy
        ar = lambda z: (z[2] - z[0] + 1) * (z[3] - z[1] + 1)
        return inter / max(ar(a) + ar(b) - inter, 1e-9)

    for _ in range(max_tries):
        ch = int(rng.uniform(min_crop_size * h, max_crop_size * h))
        cw = int(rng.uniform(min_crop_size * w, max_crop_size * w))
        if ch < 2 or cw < 2 or not (0.5 <= cw / ch <= 2.0):
            continue
        x0 = rng.randint(max(int(mid[0]) - cw + 1, 0),
                         min(int(mid[0]), w - cw) + 1)
        y0 = rng.randint(max(int(mid[1]) - ch + 1, 0),
                         min(int(mid[1]), h - ch) + 1)
        win = (x0, y0, x0 + cw - 1, y0 + ch - 1)
        if max(iou(b, win) for b in boxes) < iou_min:
            continue
        centers = 0.5 * (boxes[:, :2] + boxes[:, 2:])
        keep = ((centers[:, 0] >= win[0]) & (centers[:, 0] <= win[2])
                & (centers[:, 1] >= win[1]) & (centers[:, 1] <= win[3]))
        if not keep.any():
            continue
        nb = boxes[keep].copy()
        nb[:, [0, 2]] = np.clip(nb[:, [0, 2]] - x0, 0, cw - 1)
        nb[:, [1, 3]] = np.clip(nb[:, [1, 3]] - y0, 0, ch - 1)
        return (np.ascontiguousarray(img[y0: y0 + ch, x0: x0 + cw]),
                nb, labels[keep])
    return img, boxes, labels
