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
