"""Still-image inference runner (engine/inference_still.py): per-image
detection + COCO/VOC evaluation over the still-image adapters."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from diffusionvid_tpu.engine.inference_still import run_inference_still
from diffusionvid_tpu.models.rcnn import GeneralizedRCNN

pytestmark = pytest.mark.slow  # model-jitting integration tests (run with -m slow)


def _make_cityscapes(tmp_path):
    import cv2

    root = tmp_path / "cs"
    d = root / "gtFine" / "val" / "city"
    os.makedirs(d)
    img_dir = root / "leftImg8bit" / "val" / "city"
    os.makedirs(img_dir)
    for i in range(2):
        data = {"imgHeight": 96, "imgWidth": 128, "objects": [
            {"label": "car",
             "polygon": [[10, 20], [60, 20], [60, 50], [10, 50]]}]}
        stem = f"aaa_{i:06d}"
        with open(d / f"{stem}_gtFine_polygons.json", "w") as f:
            json.dump(data, f)
        img = (np.random.RandomState(i).uniform(0, 255, (96, 128, 3))
               ).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"{stem}_leftImg8bit.png"), img)
    return str(root)


def test_still_runner_cityscapes(tmp_path):
    from diffusionvid_tpu.data.cityscapes import CityscapesDataset

    ds = CityscapesDataset(_make_cityscapes(tmp_path), split="val")
    assert len(ds) == 2
    model = GeneralizedRCNN(depth=18, num_classes=9, pre_nms_test=64,
                            post_nms_test=16, dtype=jnp.float32)
    import jax
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 128, 3)),
                           (96, 128))
    preds, gt, results = run_inference_still(
        model, variables, ds, min_size=96, max_size=128,
        evaluator="cityscapes")
    assert len(preds) == len(gt) == 2
    assert "AP50" in results and "ap50" in results
    assert np.isfinite(results["ap50"])
