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
    # DAFA: locals dropped from the spec — train_loss consumes globals only
    ("configs/MEGA/vid_R_101_C4_DAFA_1x.yaml", "dafa", (0, 0, 4)),
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


# ---------------------------------------------------------------------------
# SSD augmentation (the live INPUT.TRANSFORM pipeline,
# reference transforms_selsa.py:449-480)
# ---------------------------------------------------------------------------

def _ssd_inputs(seed=0, n=4):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 255, (60, 90, 3), np.uint8)
    x1 = rng.uniform(0, 50, n); y1 = rng.uniform(0, 30, n)
    boxes = np.stack([x1, y1, x1 + rng.uniform(8, 30, n),
                      y1 + rng.uniform(8, 20, n)], 1).astype(np.float32)
    labels = rng.randint(1, 5, n).astype(np.int32)
    return img, boxes, labels


def test_ssd_augment_shapes_and_determinism():
    from diffusionvid_tpu.data.transforms import ssd_augment
    img, boxes, labels = _ssd_inputs()
    o1 = ssd_augment(img, boxes, labels, np.random.RandomState(3))
    o2 = ssd_augment(img, boxes, labels, np.random.RandomState(3))
    assert np.array_equal(o1[0], o2[0])
    assert np.array_equal(o1[1], o2[1]) and np.array_equal(o1[2], o2[2])
    assert o1[0].dtype == np.uint8 and o1[0].ndim == 3
    # boxes stay inside the augmented image and labels subset the input
    h, w = o1[0].shape[:2]
    assert (o1[1][:, 0] >= 0).all() and (o1[1][:, 2] <= w + 1e-3).all()
    assert (o1[1][:, 1] >= 0).all() and (o1[1][:, 3] <= h + 1e-3).all()
    assert set(o1[2].tolist()) <= set(labels.tolist())
    assert len(o1[1]) == len(o1[2]) >= 1


def test_ssd_augment_aspect_roughly_preserved():
    """Expand truncates to int and RandomSampleCrop keeps the input aspect —
    the augmented frame must land in the same orientation bucket."""
    from diffusionvid_tpu.data.transforms import ssd_augment
    img, boxes, labels = _ssd_inputs(1)
    for seed in range(12):
        out, _, _ = ssd_augment(img, boxes, labels,
                                np.random.RandomState(seed))
        h, w = out.shape[:2]
        # int truncation costs ≤1 px per dimension per op (2 ops)
        assert abs(h - w * (60 / 90)) <= 2.0, (h, w, seed)


def test_ssd_expand_mean_fill_and_box_shift():
    from diffusionvid_tpu.data.transforms import ssd_expand
    img = np.full((20, 30, 3), 7, np.float32)
    boxes = np.asarray([[2.0, 3.0, 10.0, 12.0]], np.float32)
    # rng seed whose first randint(2) is 0 → expand happens
    for seed in range(10):
        rng = np.random.RandomState(seed)
        out, nb = ssd_expand(img, boxes, rng, (123.675, 116.28, 103.53))
        if out.shape == img.shape:
            assert np.array_equal(nb, boxes)
            continue
        # the pasted region is intact; fill is round(mean[::-1])
        dy, dx = nb[0, 1] - 3.0, nb[0, 0] - 2.0
        assert dy >= 0 and dx >= 0
        top, left = int(dy), int(dx)
        assert np.array_equal(out[top:top + 20, left:left + 30], img)
        corner = out[0, 0] if (top > 0 or left > 0) else out[-1, -1]
        assert tuple(corner.astype(int)) == (104, 116, 124)
        return
    raise AssertionError("expand never triggered in 10 seeds")


def test_ssd_crop_keeps_centers_inside():
    from diffusionvid_tpu.data.transforms import ssd_random_sample_crop
    img, boxes, labels = _ssd_inputs(2)
    for seed in range(20):
        out, nb, nl = ssd_random_sample_crop(
            img.astype(np.float32), boxes, labels, np.random.RandomState(seed))
        h, w = out.shape[:2]
        if out.shape != img.shape:
            assert len(nb) >= 1 and len(nb) == len(nl)
            assert (nb[:, 2] <= w + 1e-3).all() and (nb[:, 3] <= h + 1e-3).all()
            assert (nb[:, :2] >= 0).all()


def test_ssd_augment_empty_boxes():
    from diffusionvid_tpu.data.transforms import ssd_augment
    img = np.random.RandomState(0).randint(0, 255, (40, 60, 3), np.uint8)
    boxes = np.zeros((0, 4), np.float32)
    labels = np.zeros((0,), np.int32)
    out, nb, nl = ssd_augment(img, boxes, labels, np.random.RandomState(5))
    assert nb.shape == (0, 4) and nl.shape == (0,)
    assert out.dtype == np.uint8


def test_train_sample_with_ssd_transform(tmp_path):
    """build_train_sample with INPUT.TRANSFORM: every frame lands on the
    sample's static bucket, GT stays inside the resized extent, and each
    frame (including DET-still replicas) is augmented independently."""
    import cv2
    import xml.etree.ElementTree as ET
    from diffusionvid_tpu.data import VIDDataset, VID_WNIDS
    from diffusionvid_tpu.data.sampling import SampleConfig, build_train_sample

    img_dir = tmp_path / "Data" / "VID"
    anno_dir = tmp_path / "Annotations" / "VID"
    (img_dir / "val/v0").mkdir(parents=True)
    (anno_dir / "val/v0").mkdir(parents=True)
    lines = []
    for f in range(4):
        img = np.full((160, 240, 3), 30, np.uint8)
        cv2.rectangle(img, (40 + 10 * f, 40), (110 + 10 * f, 100),
                      (0, 200, 0), -1)
        cv2.imwrite(str(img_dir / "val/v0" / f"{f:06d}.JPEG"), img)
        root = ET.Element("annotation")
        size = ET.SubElement(root, "size")
        ET.SubElement(size, "height").text = "160"
        ET.SubElement(size, "width").text = "240"
        o = ET.SubElement(root, "object")
        ET.SubElement(o, "name").text = VID_WNIDS[7]
        bb = ET.SubElement(o, "bndbox")
        for k, v in zip(("xmin", "ymin", "xmax", "ymax"),
                        (40 + 10 * f, 40, 110 + 10 * f, 100)):
            ET.SubElement(bb, k).text = str(v)
        ET.ElementTree(root).write(str(anno_dir / "val/v0" / f"{f:06d}.xml"))
        lines.append(f"val/v0 1 {f} 4")
    index = tmp_path / "index.txt"
    index.write_text("\n".join(lines) + "\n")
    ds = VIDDataset("train_set", str(tmp_path), str(img_dir), str(anno_dir),
                    str(index), is_train=True, use_cache=False)
    cfg = SampleConfig(num_global=2, max_gt=8, min_size=128, max_size=256,
                       transform=True)
    s = build_train_sample(ds, 0, np.random.RandomState(0), cfg)
    assert s["images"].shape[0] == 3
    rw, rh = s["whwh"][0], s["whwh"][1]
    bh, bw = s["bucket"]
    assert s["images"].shape[1:3] == (bh, bw)
    v = s["gt_valid"]
    assert v.any()
    b = s["gt_boxes"]
    assert (b[v][:, 2] <= rw + 1e-3).all() and (b[v][:, 3] <= rh + 1e-3).all()
    assert (b[v] >= -1e-3).all()
    # independent augmentation: global refs differ from cur with high prob
    assert not np.array_equal(s["images"][0], s["images"][1]) or \
        not np.array_equal(s["images"][0], s["images"][2])


def test_device_preprocess_matches_host_transform():
    """device_resize_pad reproduces the host transform_frame path
    (cv2 INTER_LINEAR vs jax.image.resize 'linear', same half-pixel
    convention) to ~1 intensity step, with identical padding."""
    from diffusionvid_tpu.data.transforms import (
        frame_bucket, resize_scale, transform_frame)
    from diffusionvid_tpu.engine.preprocess import make_device_preprocess

    rng = np.random.RandomState(0)
    h0, w0 = 90, 140
    raw = rng.randint(0, 255, (2, h0, w0, 3), np.uint8)
    # smooth it: bilinear implementations differ most on noise edges
    import cv2
    raw = np.stack([cv2.GaussianBlur(r, (0, 0), 2) for r in raw])

    fn, whwh, bucket = make_device_preprocess(h0, w0, min_size=64,
                                              max_size=128)
    got = np.asarray(fn(raw))
    scale = resize_scale(h0, w0, 64, 128)
    want = np.stack([transform_frame(r, scale, False, bucket) for r in raw])
    assert got.shape == want.shape
    rh, rw = int(round(h0 * scale)), int(round(w0 * scale))
    np.testing.assert_allclose(whwh, [rw, rh, rw, rh])
    # padding region identical (zeros)
    assert (got[:, rh:] == 0).all() and (got[:, :, rw:] == 0).all()
    err = np.abs(got[:, :rh, :rw] - want[:, :rh, :rw].astype(np.float32))
    assert err.mean() < 0.5 and err.max() <= 4.0, (err.mean(), err.max())


def test_yuv_device_preprocess_matches_cv2():
    """The device I420 → RGB conversion inverts cv2.COLOR_BGR2YUV_I420
    the same way cv2.COLOR_YUV2RGB_I420 does (BT.601 video range,
    nearest 2x2 chroma upsample): ±1.5/255 on the content region, exact
    zero padding, and an odd resize width exercises the even-pad crop."""
    import cv2

    from diffusionvid_tpu.data.transforms import resize_scale
    from diffusionvid_tpu.engine.preprocess import make_yuv_device_preprocess

    rng = np.random.RandomState(1)
    h0, w0 = 90, 143                       # odd resized width downstream
    raw = np.stack([cv2.GaussianBlur(r, (0, 0), 2) for r in
                    rng.randint(0, 255, (2, h0, w0, 3), np.uint8)])

    encode, fn, whwh, bucket = make_yuv_device_preprocess(
        h0, w0, min_size=64, max_size=128)
    packed = np.stack([encode(r) for r in raw])
    assert packed.dtype == np.uint8
    got = np.asarray(fn(packed))

    scale = resize_scale(h0, w0, 64, 128)
    rh, rw = int(round(h0 * scale)), int(round(w0 * scale))
    np.testing.assert_allclose(whwh, [rw, rh, rw, rh])
    assert got.shape == (2, *bucket, 3)
    assert (got[:, rh:] == 0).all() and (got[:, :, rw:] == 0).all()

    # oracle: cv2's own inverse of the exact packed buffer (RGB order)
    want = np.stack([cv2.cvtColor(p, cv2.COLOR_YUV2RGB_I420) for p in packed])
    err = np.abs(got[:, :rh, :rw] - want[:, :rh + (rh & 1), :rw + (rw & 1)]
                 [:, :rh, :rw].astype(np.float32))
    assert err.mean() < 0.5 and err.max() <= 1.5, (err.mean(), err.max())

    # end-to-end sanity vs the plain resized RGB frame: chroma subsample
    # error only (smooth image -> small)
    direct = np.stack([cv2.resize(r, (rw, rh))[:, :, ::-1] for r in raw])
    err2 = np.abs(got[:, :rh, :rw] - direct.astype(np.float32))
    assert err2.mean() < 4.0 and err2.max() < 45.0, (err2.mean(), err2.max())
