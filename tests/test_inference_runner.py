"""Full inference-runner integration test: synthetic video dataset →
streaming detect → predictions → evaluation → saved artifacts → re-eval."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from tests.test_data import mini_vid, _write_xml  # fixture reuse  # noqa: F401
from diffusionvid_tpu.data import VIDDataset, SampleConfig
from diffusionvid_tpu.engine.inference import run_inference, inference_no_model
from diffusionvid_tpu.models.diffusion_det import DiffusionDetArch

pytestmark = pytest.mark.slow  # model-jitting integration tests (run with -m slow)


@pytest.mark.slow
def test_run_inference_end_to_end(mini_vid, tmp_path):  # noqa: F811
    import jax

    ds = VIDDataset("itest", mini_vid["root"], mini_vid["img_dir"],
                    mini_vid["anno_dir"], mini_vid["index"], is_train=False,
                    use_cache=False)
    model = DiffusionDetArch(depth=50, num_classes=30, num_proposals=8,
                             num_heads=1, num_heads_local=1,
                             compute_dtype=jnp.float32)
    noisy = jnp.tile(jnp.asarray([8.0, 8.0, 60.0, 40.0]), (2, 8, 1))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "cfg": jax.random.PRNGKey(1)},
        jnp.zeros((2, 64, 96, 3)), noisy, jnp.zeros((2,), jnp.int32),
        num_global=1, train=False)

    cfg = SampleConfig(global_size=2, infer_batch=2, min_size=128, max_size=256)
    out_dir = str(tmp_path / "inf")
    preds, gts, results = run_inference(
        model, variables, ds, cfg, sample_step=1, mem_size=16,
        num_proposals=8, output_dir=out_dir, max_videos=1)

    assert len(preds) == 6 and len(gts) == 6
    assert results is not None and np.isfinite(results["ap50"] or 0.0)
    # predictions are in ORIGINAL image coordinates (≤ 240 wide)
    for p in preds:
        if len(p["boxes"]):
            assert p["boxes"][:, 2].max() <= 240 + 1e-3
    assert os.path.exists(os.path.join(out_dir, "predictions.pkl"))
    assert os.path.exists(os.path.join(out_dir, "result.txt"))

    # no-model re-eval matches (on the one processed video's frames)
    ds_annos = ds.annos[:6]

    class _Sub:
        annos = ds_annos
    res2 = inference_no_model(os.path.join(out_dir, "predictions.pkl"), _Sub)
    assert abs((res2["ap50"] or 0) - (results["ap50"] or 0)) < 1e-9
