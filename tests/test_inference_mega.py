"""Method-generic inference runner over the synthetic dataset for the
classic/MEGA family (tiny models, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_data import mini_vid, _write_xml  # noqa: F401
from diffusionvid_tpu.data import VIDDataset, SampleConfig
from diffusionvid_tpu.engine.inference_mega import run_inference_video_arch

pytestmark = pytest.mark.slow  # model-jitting integration tests (run with -m slow)


@pytest.fixture(scope="module")
def ds(mini_vid):  # noqa: F811
    return VIDDataset("megatest", mini_vid["root"], mini_vid["img_dir"],
                      mini_vid["anno_dir"], mini_vid["index"], is_train=False,
                      use_cache=False)


CFG = SampleConfig(global_size=4, infer_batch=2, min_size=96, max_size=192)


@pytest.mark.slow
def test_base_runner(ds):
    from diffusionvid_tpu.models.rcnn import GeneralizedRCNN
    model = GeneralizedRCNN(depth=50, num_classes=31, anchor_sizes=(32, 64),
                            pre_nms_test=64, post_nms_test=16,
                            pre_nms_train=64, post_nms_train=16)
    h, w = 96, 160
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, h, w, 3)), (h, w), train=False)
    preds, gts, results = run_inference_video_arch(
        model, variables, ds, CFG, method="base", max_videos=1)
    assert len(preds) == 6 and len(gts) == 6
    assert results is not None


@pytest.mark.slow
def test_mega_runner(ds):
    from diffusionvid_tpu.models.video_archs import MEGAArch
    model = MEGAArch(depth=50, num_classes=31, memory_size=32,
                     pre_nms=64, post_nms=16)
    h, w = 96, 160
    cur = jnp.zeros((1, h, w, 3))
    refs = jnp.zeros((2, h, w, 3))
    state = model.init_state()
    variables = model.init({"params": jax.random.PRNGKey(0)}, cur, refs,
                           (h, w), state=state)
    preds, gts, results = run_inference_video_arch(
        model, variables, ds, CFG, method="mega", max_videos=1)
    assert len(preds) == 6
    for p in preds:
        assert np.isfinite(p["boxes"]).all()


@pytest.mark.slow
def test_mega_runner_shuffled_cur(ds):
    """MODEL.VID.MEGA.SHUFFLED_CUR_TEST (vid_mega.py:13-14, 166-186):
    frames are VISITED in a shuffled per-video order with the local queue
    reduced to the current frame, but predictions must come out
    frame-aligned — every slot filled, finite boxes."""
    from diffusionvid_tpu.models.video_archs import MEGAArch
    model = MEGAArch(depth=50, num_classes=31, memory_size=32,
                     pre_nms=64, post_nms=16)
    h, w = 96, 160
    cur = jnp.zeros((1, h, w, 3))
    refs = jnp.zeros((2, h, w, 3))
    state = model.init_state()
    variables = model.init({"params": jax.random.PRNGKey(0)}, cur, refs,
                           (h, w), state=state)
    preds, gts, _ = run_inference_video_arch(
        model, variables, ds, CFG, method="mega", max_videos=1,
        shuffled_cur=True)
    assert len(preds) == 6
    for p in preds:
        assert p is not None
        assert np.isfinite(p["boxes"]).all()


@pytest.mark.slow
def test_base_runner_multiscale_tta(ds):
    """TEST.BBOX_AUG with h-flip + a scale variant: detections from every
    augmentation land in the same (original-image) coordinate frame and
    merge into valid boxes (reference bbox_aug.py:40-49 scale path)."""
    from diffusionvid_tpu.models.rcnn import GeneralizedRCNN
    model = GeneralizedRCNN(depth=50, num_classes=31, anchor_sizes=(32, 64),
                            pre_nms_test=64, post_nms_test=16,
                            pre_nms_train=64, post_nms_train=16)
    h, w = 96, 160
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, h, w, 3)), (h, w), train=False)
    preds, gts, _ = run_inference_video_arch(
        model, variables, ds, CFG, method="base", max_videos=1,
        use_bbox_aug=True, bbox_aug_h_flip=True, bbox_aug_scales=(64,),
        bbox_aug_max_size=192)
    assert len(preds) == 6
    anno_w, anno_h = ds.annos[0].width, ds.annos[0].height
    for p in preds:
        b = p["boxes"]
        if len(b):
            assert (b[:, 2] >= b[:, 0]).all() and (b[:, 3] >= b[:, 1]).all()
            assert b[:, 2].max() <= anno_w + 2 and b[:, 3].max() <= anno_h + 2
            assert b.min() >= -2


def test_bbox_aug_unsupported_method_raises(ds):
    from diffusionvid_tpu.models.video_archs import MEGAArch
    model = MEGAArch(depth=50, num_classes=31, memory_size=32,
                     pre_nms=64, post_nms=16)
    with pytest.raises(ValueError, match="BBOX_AUG"):
        run_inference_video_arch(model, {}, ds, CFG, method="mega",
                                 use_bbox_aug=True)
