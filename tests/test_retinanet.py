"""RetinaNet parity subtree: shapes, loss gradient flow, and inference
(reference mega_core/modeling/rpn/retinanet/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionvid_tpu.models.retinanet import RetinaNet

pytestmark = pytest.mark.slow  # model-jitting integration tests (run with -m slow)


@pytest.fixture(scope="module")
def tiny():
    # score_thresh=0: random-init logits sit at the prior (p≈0.01), below
    # the production 0.05 threshold — the test checks shapes/plumbing
    model = RetinaNet(depth=18, num_classes=7, pre_nms_top_n=200,
                      detections=20, score_thresh=0.0, dtype=jnp.float32)
    h, w = 64, 96
    images = jnp.asarray(np.random.RandomState(0).uniform(0, 255, (1, h, w, 3)),
                         jnp.float32)
    gt_boxes = jnp.asarray([[[10.0, 10.0, 50.0, 40.0],
                             [30.0, 20.0, 90.0, 60.0]]])
    gt_labels = jnp.asarray([[2, 5]], jnp.int32)
    gt_valid = jnp.asarray([[True, True]])
    variables = model.init(jax.random.PRNGKey(0), images, (h, w),
                           gt_boxes, gt_labels, gt_valid, train=True)
    return model, variables, images, (h, w), gt_boxes, gt_labels, gt_valid


@pytest.mark.slow
def test_train_losses_finite_and_grad(tiny):
    model, variables, images, hw, gb, gl, gv = tiny

    def loss(params):
        d = model.apply({"params": params}, images, hw, gb, gl, gv,
                        train=True)
        return d["loss_retina_cls"] + d["loss_retina_reg"], d

    (total, d), grads = jax.value_and_grad(loss, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(total))
    assert float(d["loss_retina_reg"]) > 0
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), grads, 0.0)
    assert gnorm > 0


@pytest.mark.slow
def test_inference_shapes(tiny):
    model, variables, images, hw, *_ = tiny
    dets = model.apply(variables, images, hw, train=False)
    assert dets.boxes.shape == (1, 20, 4)
    assert dets.scores.shape == (1, 20)
    assert dets.labels.shape == (1, 20)
    assert bool(dets.valid.any())
    # labels are 1..K (background has no slot in sigmoid retinanet)
    lab = np.asarray(dets.labels)[np.asarray(dets.valid)]
    assert lab.min() >= 1 and lab.max() <= 7


@pytest.mark.slow
def test_perfect_anchor_low_loss(tiny):
    """A GT matching many anchors should yield a positive count > 0 so the
    focal loss normalizer is nontrivial (loss decreases when logits favor
    the right class)."""
    model, variables, images, hw, gb, gl, gv = tiny
    d0 = model.apply(variables, images, hw, gb, gl, gv, train=True)
    assert float(d0["loss_retina_cls"]) > 0


def test_dispatcher_retinanet():
    from diffusionvid_tpu.config import load_config
    from diffusionvid_tpu.models.detectors import build_detection_model
    cfg = load_config()
    cfg.MODEL.RETINANET_ON = True
    model = build_detection_model(cfg)
    assert isinstance(model, RetinaNet)
    assert model.num_classes == 81
