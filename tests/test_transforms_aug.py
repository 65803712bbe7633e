"""Train-time augmentation + per-method sampling spec tests
(reference mega_core/data/transforms/transforms.py:101-330 and the
per-method dataset wrappers)."""

import numpy as np
import pytest

from diffusionvid_tpu.data.transforms import (
    color_jitter, random_crop, random_pad)
from diffusionvid_tpu.data.sampling import MethodSampleSpec
from diffusionvid_tpu.config import load_config


def test_color_jitter_shape_dtype_and_variation():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (40, 60, 3), np.uint8)
    out = color_jitter(img, np.random.RandomState(1))
    assert out.shape == img.shape and out.dtype == np.uint8
    # different rng state → different result; same state → deterministic
    out2 = color_jitter(img, np.random.RandomState(1))
    out3 = color_jitter(img, np.random.RandomState(2))
    assert np.array_equal(out, out2)
    assert not np.array_equal(out, out3)


def test_color_jitter_zero_ranges_identity():
    img = np.random.RandomState(0).randint(0, 255, (16, 16, 3), np.uint8)
    out = color_jitter(img, np.random.RandomState(0), brightness=0,
                       contrast=0, saturation=0, hue=0)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_random_pad_shifts_boxes():
    img = np.ones((30, 40, 3), np.uint8) * 100
    boxes = np.asarray([[5.0, 6.0, 20.0, 25.0]])
    out, nb = random_pad(img, boxes, np.random.RandomState(3), prob=1.0)
    pad = (out.shape[0] - 30) // 2
    assert out.shape[0] == 30 + 2 * pad and out.shape[1] == 40 + 2 * pad
    assert np.allclose(nb, boxes + pad)
    # padded border is zero, content preserved
    assert (out[pad: pad + 30, pad: pad + 40] == 100).all()
    if pad > 0:
        assert (out[:pad] == 0).all()


def test_random_pad_prob_zero_identity():
    img = np.zeros((10, 10, 3), np.uint8)
    boxes = np.asarray([[1.0, 1.0, 5.0, 5.0]])
    out, nb = random_pad(img, boxes, np.random.RandomState(0), prob=0.0)
    assert out is img and nb is boxes


def test_random_crop_keeps_selected_center():
    rng = np.random.RandomState(7)
    img = np.arange(100 * 120 * 3, dtype=np.uint8).reshape(100, 120, 3)
    boxes = np.asarray([[30.0, 30.0, 70.0, 60.0], [0.0, 0.0, 5.0, 5.0]])
    labels = np.asarray([1, 2])
    out, nb, nl = random_crop(img, boxes, labels, rng, prob=1.0)
    assert out.ndim == 3 and len(nb) == len(nl) >= 1
    assert (nb[:, 0] <= nb[:, 2]).all() and (nb[:, 1] <= nb[:, 3]).all()
    assert (nb >= 0).all()
    assert nb[:, 2].max() < out.shape[1] and nb[:, 3].max() < out.shape[0]


def test_random_crop_no_boxes_identity():
    img = np.zeros((20, 20, 3), np.uint8)
    out, nb, nl = random_crop(img, np.zeros((0, 4)), np.zeros((0,), int),
                              np.random.RandomState(0), prob=1.0)
    assert out is img


@pytest.mark.parametrize("path,method,counts", [
    ("configs/DFF/vid_R_101_C4_DFF_1x.yaml", "dff", (1, 0, 0)),
    ("configs/FGFA/vid_R_101_C4_FGFA_1x.yaml", "fgfa", (2, 0, 0)),
    ("configs/RDN/vid_R_101_C4_RDN_base_1x.yaml", "rdn", (2, 0, 0)),
    ("configs/MEGA/vid_R_101_C4_MEGA_1x.yaml", "mega", (2, 3, 2)),
    ("configs/MEGA/vid_R_101_C4_DAFA_1x.yaml", "dafa", (4, 0, 4)),
])
def test_method_sample_spec_from_config(path, method, counts):
    cfg = load_config(path)
    spec = MethodSampleSpec.from_config(cfg)
    assert spec.method == method
    assert (spec.num_local, spec.num_mem, spec.num_global) == counts


def test_method_sample_spec_offsets():
    cfg = load_config("configs/RDN/vid_R_101_C4_RDN_base_1x.yaml")
    spec = MethodSampleSpec.from_config(cfg)
    assert (spec.min_offset, spec.max_offset) == (-18, 18)
    cfg = load_config("configs/DFF/vid_R_101_C4_DFF_1x.yaml")
    spec = MethodSampleSpec.from_config(cfg)
    assert (spec.min_offset, spec.max_offset) == (-9, 0)
