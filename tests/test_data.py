"""Data pipeline tests over a synthetic mini-ILSVRC tree (JPEG frames +
XML annotations generated on the fly)."""

import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from diffusionvid_tpu.data import (
    VIDDataset, SampleConfig, build_train_sample, iter_test_videos,
    train_sample_stream, resize_scale, frame_bucket, transform_frame,
    VID_WNIDS,
)


def _write_xml(path, h, w, objs):
    root = ET.Element("annotation")
    size = ET.SubElement(root, "size")
    ET.SubElement(size, "height").text = str(h)
    ET.SubElement(size, "width").text = str(w)
    for wnid, (x1, y1, x2, y2) in objs:
        o = ET.SubElement(root, "object")
        ET.SubElement(o, "name").text = wnid
        bb = ET.SubElement(o, "bndbox")
        for k, v in zip(("xmin", "ymin", "xmax", "ymax"), (x1, y1, x2, y2)):
            ET.SubElement(bb, k).text = str(v)
    ET.ElementTree(root).write(path)


@pytest.fixture(scope="module")
def mini_vid(tmp_path_factory):
    """2 videos × 6 frames, 160×240 images, one moving box each."""
    import cv2
    root = tmp_path_factory.mktemp("ilsvrc")
    img_dir = root / "Data" / "VID"
    anno_dir = root / "Annotations" / "VID"
    h, w = 160, 240
    index_lines = []
    for v in range(2):
        vdir = f"val/vid_{v:04d}"
        (img_dir / vdir).mkdir(parents=True)
        (anno_dir / vdir).mkdir(parents=True)
        for f in range(6):
            img = np.full((h, w, 3), 30, np.uint8)
            x = 20 + 10 * f + 40 * v
            cv2.rectangle(img, (x, 40), (x + 50, 100), (0, 200, 0), -1)
            cv2.imwrite(str(img_dir / vdir / f"{f:06d}.JPEG"), img)
            _write_xml(str(anno_dir / vdir / f"{f:06d}.xml"), h, w,
                       [(VID_WNIDS[7], (x, 40, x + 50, 100))])  # class 'car'
            index_lines.append(f"{vdir} 1 {f} 6")
    index = root / "index.txt"
    index.write_text("\n".join(index_lines) + "\n")
    return dict(root=str(root), img_dir=str(img_dir), anno_dir=str(anno_dir),
                index=str(index), h=h, w=w)


def test_dataset_parsing(mini_vid):
    ds = VIDDataset("test_set", mini_vid["root"], mini_vid["img_dir"],
                    mini_vid["anno_dir"], mini_vid["index"], is_train=False,
                    use_cache=False)
    assert len(ds) == 12
    assert ds.is_video
    anno = ds.get_groundtruth(0)
    assert anno.height == 160 and anno.width == 240
    assert anno.labels.tolist() == [7]
    np.testing.assert_allclose(anno.boxes[0], [20, 40, 70, 100])
    assert ds.video_starts() == [0, 6]


def test_resize_and_bucket():
    # 720p: scale by 1000/1280 (long side caps), landscape bucket.
    s = resize_scale(720, 1280)
    assert abs(s - 1000 / 1280) < 1e-6
    assert frame_bucket(720, 1280) == (608, 1024)
    assert frame_bucket(1280, 720) == (1024, 608)
    img = np.random.rand(720, 1280, 3).astype(np.float32)
    out = transform_frame(img, s, True, (608, 1024))
    assert out.shape == (608, 1024, 3)


def test_train_sample(mini_vid):
    ds = VIDDataset("train_set", mini_vid["root"], mini_vid["img_dir"],
                    mini_vid["anno_dir"], mini_vid["index"], is_train=True,
                    use_cache=False)
    cfg = SampleConfig(num_global=3, max_gt=8, min_size=128, max_size=256)
    rng = np.random.RandomState(0)
    sample = build_train_sample(ds, 0, rng, cfg)
    assert sample["images"].shape[0] == 4  # 1 cur + 3 global
    assert sample["gt_valid"][0].sum() == 1
    assert sample["gt_labels"][0][0] == 7
    # GT scaled consistently with whwh
    scale = sample["whwh"][0] / 240.0
    np.testing.assert_allclose(sample["gt_boxes"][0][0][2] / scale, 70, atol=2 / float(scale))

    stream = train_sample_stream(ds, cfg, seed=0)
    s0 = next(stream)
    assert s0["images"].ndim == 4


def test_test_video_iteration(mini_vid):
    ds = VIDDataset("test_set2", mini_vid["root"], mini_vid["img_dir"],
                    mini_vid["anno_dir"], mini_vid["index"], is_train=False,
                    use_cache=False)
    cfg = SampleConfig(global_size=4, infer_batch=4, min_size=128, max_size=256)
    videos = list(iter_test_videos(ds, cfg, seed=0))
    assert len(videos) == 2
    v = videos[0]
    assert v.seg_len == 6
    assert v.global_frames.shape[0] == 4
    chunks = list(v.chunk_iter)
    assert len(chunks) == 2           # 6 frames / 4 per chunk
    frames, ids, n_valid = chunks[1]
    assert frames.shape[0] == 4       # tail padded
    assert n_valid == 2
    assert ids[:2] == [4, 5]
    assert len(v.frame_annos) == 6

    # video-boundary sharding
    shard0 = list(iter_test_videos(ds, cfg, shard=0, num_shards=2))
    shard1 = list(iter_test_videos(ds, cfg, shard=1, num_shards=2))
    assert len(shard0) == 1 and len(shard1) == 1
    assert shard0[0].video_index != shard1[0].video_index


def test_concat_dataset(mini_vid):
    from diffusionvid_tpu.data import ConcatDataset, SampleConfig
    ds1 = VIDDataset("c1", mini_vid["root"], mini_vid["img_dir"],
                     mini_vid["anno_dir"], mini_vid["index"], is_train=True,
                     use_cache=False)
    ds2 = VIDDataset("c2", mini_vid["root"], mini_vid["img_dir"],
                     mini_vid["anno_dir"], mini_vid["index"], is_train=True,
                     use_cache=False)
    cat = ConcatDataset([ds1, ds2])
    assert len(cat) == len(ds1) + len(ds2)
    assert len(cat.annos) == len(cat)
    cfg = SampleConfig(num_global=1, max_gt=4, min_size=128, max_size=256)
    rng = np.random.RandomState(0)
    s = cat.sample(len(ds1) + 2, rng, cfg)   # index in the second dataset
    assert s["images"].shape[0] == 2


def test_multiscale_jitter(mini_vid):
    from diffusionvid_tpu.data import SampleConfig, build_train_sample
    ds = VIDDataset("ms", mini_vid["root"], mini_vid["img_dir"],
                    mini_vid["anno_dir"], mini_vid["index"], is_train=True,
                    use_cache=False)
    cfg = SampleConfig(num_global=1, max_gt=4, min_size=(96, 128),
                       max_size=256)
    rng = np.random.RandomState(0)
    shapes = set()
    whwhs = set()
    for _ in range(8):
        s = build_train_sample(ds, 0, rng, cfg)
        shapes.add(s["images"].shape[1:3])
        whwhs.add(tuple(s["whwh"].tolist()))
    # one static bucket, multiple true sizes
    assert len(shapes) == 1
    assert len(whwhs) > 1


def test_config_tuple_decoding():
    from diffusionvid_tpu.config import CfgNode
    c = CfgNode()
    c.merge_from_str('DATASETS:\n  TRAIN: ("a", "b")\n  TEST: ("c",)\n')
    assert c.DATASETS.TRAIN == ("a", "b")
    assert c.DATASETS.TEST == ("c",)
