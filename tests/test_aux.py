"""Aux subsystem tests: bbox TTA, samplers, COCO/VOC adapters, multihost
merge (single-process path), logging/metrics."""

import json
import os

import numpy as np
import pytest

from diffusionvid_tpu.engine.bbox_aug import (
    flip_boxes_back, merge_augmented, hflip_tta)
from diffusionvid_tpu.data.samplers import grouped_batches
from diffusionvid_tpu.data.coco_voc import COCODataset, evaluate_still
from diffusionvid_tpu.parallel.multihost import gather_predictions
from diffusionvid_tpu.utils import MetricLogger, SmoothedValue


def test_flip_boxes_roundtrip():
    boxes = np.asarray([[10.0, 5.0, 50.0, 45.0]])
    back = flip_boxes_back(flip_boxes_back(boxes, 100.0), 100.0)
    np.testing.assert_allclose(back, boxes)


def test_merge_augmented_dedups():
    d0 = {"boxes": np.asarray([[10, 10, 50, 50]], np.float32),
          "scores": np.asarray([0.9], np.float32),
          "labels": np.asarray([2])}
    d1 = {"boxes": np.asarray([[11, 11, 51, 51]], np.float32),
          "scores": np.asarray([0.8], np.float32),
          "labels": np.asarray([2])}
    m = merge_augmented([d0, d1])
    assert len(m["scores"]) == 1 and m["scores"][0] == pytest.approx(0.9)
    # different class survives
    d2 = dict(d1, labels=np.asarray([3]))
    m2 = merge_augmented([d0, d2])
    assert len(m2["scores"]) == 2


def test_hflip_tta_merges():
    def fake_detect(frames, whwh):
        # one box at left edge in the given frames
        return [{"boxes": np.asarray([[0.0, 0.0, 10.0, 10.0]], np.float32),
                 "scores": np.asarray([0.7], np.float32),
                 "labels": np.asarray([1])} for _ in range(len(frames))]

    frames = np.zeros((2, 8, 16, 3), np.float32)
    whwh = np.asarray([16.0, 8.0, 16.0, 8.0])
    out = hflip_tta(fake_detect, frames, whwh)
    assert len(out) == 2
    # original at x=0..10 and flipped-back at x=5..15 → two distinct boxes
    assert len(out[0]["scores"]) == 2


def test_grouped_batches_single_group_per_batch():
    group_ids = np.asarray([0, 1] * 10)
    batches = []
    for i, b in enumerate(grouped_batches(group_ids, 4, seed=1)):
        batches.append(b)
        if i >= 9:
            break
    for b in batches:
        gs = {int(group_ids[i]) for i in b}
        assert len(gs) == 1
        assert len(b) == 4


def test_grouped_batches_sharding_disjoint():
    group_ids = np.zeros(32, np.int64)
    b0 = next(grouped_batches(group_ids, 8, seed=0, shard=0, num_shards=2))
    b1 = next(grouped_batches(group_ids, 8, seed=0, shard=1, num_shards=2))
    assert not (set(b0) & set(b1))


def test_coco_adapter(tmp_path):
    coco = {
        "images": [{"id": 1, "file_name": "a.jpg", "height": 100, "width": 200},
                   {"id": 2, "file_name": "b.jpg", "height": 100, "width": 200}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 7,
             "bbox": [10, 20, 30, 40], "iscrowd": 0},
        ],
        "categories": [{"id": 7, "name": "car"}, {"id": 9, "name": "dog"}],
    }
    p = tmp_path / "instances.json"
    p.write_text(json.dumps(coco))
    ds = COCODataset(str(p), str(tmp_path))
    assert len(ds) == 1                       # empty image filtered
    anno = ds.get_groundtruth(0)
    np.testing.assert_allclose(anno.boxes[0], [10, 20, 40, 60])
    assert anno.labels[0] == 1                # cat id 7 → contiguous 1
    assert ds.classes == ("__background__", "car", "dog")

    preds = [{"boxes": anno.boxes, "scores": np.asarray([0.9], np.float32),
              "labels": anno.labels}]
    res = evaluate_still(ds, preds)
    assert res["ap50"] == pytest.approx(1.0)


def test_gather_predictions_single_process_identity():
    preds = [{"boxes": np.zeros((1, 4))}]
    assert gather_predictions(preds) is preds


def test_metric_logger():
    m = MetricLogger()
    for v in range(10):
        m.update(loss=float(v))
    assert m.loss.count == 10
    assert m.loss.global_avg == pytest.approx(4.5)
    assert "loss" in str(m)
    s = SmoothedValue(window=3)
    for v in (1, 2, 9):
        s.update(v)
    assert s.median == 2


def test_metrics_writer_and_resume_purge(tmp_path):
    from diffusionvid_tpu.utils import MetricsWriter
    d = str(tmp_path)
    w = MetricsWriter(d)
    for step in (10, 20, 30):
        w.write(step, loss=1.0 / step)
    w.close()
    # resume at 20 purges the step-30 record
    w2 = MetricsWriter(d, resume_step=20)
    w2.write(25, loss=0.5)
    w2.close()
    lines = [json.loads(l) for l in open(os.path.join(d, "metrics.jsonl"))]
    assert [r["step"] for r in lines] == [10, 20, 25]


def test_check_expected_results():
    from diffusionvid_tpu.utils import check_expected_results
    check_expected_results({"ap50": 0.87}, [["ap50", 0.869, 0.005]], 4)
    with pytest.raises(AssertionError):
        check_expected_results({"ap50": 0.5}, [["ap50", 0.869, 0.005]], 4)


def test_prefetch_iterator_order_and_errors():
    from diffusionvid_tpu.data.prefetch import PrefetchIterator, prefetch_map
    assert list(PrefetchIterator(iter(range(20)), depth=3)) == list(range(20))
    out = list(prefetch_map(lambda x: x * x, range(10), workers=4, depth=4))
    assert out == [x * x for x in range(10)]

    def boom():
        yield 1
        raise ValueError("boom")
    it = PrefetchIterator(boom())
    assert next(it) == 1
    with pytest.raises(ValueError):
        next(it)


def test_polygon_masks_and_keypoints():
    from diffusionvid_tpu.structures.masks import PolygonMasks, Keypoints
    tri = np.asarray([[[2, 2], [10, 2], [6, 10], [0, 0]]], np.float32)
    m = PolygonMasks(tri, np.asarray([3], np.int32))
    r = m.rasterize(12, 12)
    assert r.shape == (1, 12, 12) and r.sum() > 10
    m2 = m.resize(2.0, 1.0)
    assert m2.vertices[0, 1, 0] == 20
    mf = m.transpose_lr(12)
    assert mf.vertices[0, 0, 0] == 12 - 2 - 1

    kp = Keypoints(np.zeros((1, 17, 3), np.float32))
    kp.points[0, 1] = [3, 4, 2]   # left_eye
    kf = kp.transpose_lr(10)
    assert kf.points[0, 2, 0] == 10 - 3 - 1   # right_eye got the flipped x


def test_lr_schedules():
    import jax.numpy as jnp
    from diffusionvid_tpu.engine import (
        warmup_multistep_schedule, warmup_cosine_schedule)
    step = warmup_multistep_schedule(1.0, (100, 200), gamma=0.1,
                                     warmup_iters=10, warmup_factor=0.1)
    assert float(step(0)) == pytest.approx(0.1)
    assert float(step(10)) == pytest.approx(1.0)
    assert float(step(150)) == pytest.approx(0.1)
    assert float(step(250)) == pytest.approx(0.01)

    cos = warmup_cosine_schedule(1.0, 100, warmup_iters=10, warmup_factor=0.1)
    assert float(cos(0)) == pytest.approx(0.1)
    assert float(cos(10)) == pytest.approx(1.0)
    assert float(cos(100)) == pytest.approx(0.0, abs=1e-6)
    assert 0.4 < float(cos(55)) < 0.6
