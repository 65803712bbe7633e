"""Per-method training steps (engine/train_methods.py): every
MEGA-family meta-architecture takes jitted optimizer steps with finite
losses, and the loss decreases on a fixed batch (the reference trains each
method through the same do_train loop, engine/trainer.py:43-146)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionvid_tpu.data.sampling import MethodSampleSpec
from diffusionvid_tpu.engine import TrainBatch, TrainState, make_optimizer
from diffusionvid_tpu.engine.train_methods import make_method_train_step
from diffusionvid_tpu.models.dafa import SparseRCNNDAFA
from diffusionvid_tpu.models.rcnn import GeneralizedRCNN
from diffusionvid_tpu.models.video_archs import (
    DFFArch, FGFAArch, MEGAArch, RDNArch)

pytestmark = pytest.mark.slow  # model-jitting integration tests (run with -m slow)

H, W, G = 64, 96, 8


def make_batch(b, seed=0):
    rng = np.random.RandomState(seed)
    images = jnp.asarray(rng.uniform(0, 255, (1, b, H, W, 3)), jnp.float32)
    gt_boxes = jnp.tile(jnp.asarray([10.0, 10.0, 50.0, 40.0]), (1, b, G, 1))
    gt_labels = jnp.full((1, b, G), 2, jnp.int32)
    gt_valid = jnp.zeros((1, b, G), bool).at[..., 0].set(True)
    whwh = jnp.tile(jnp.asarray([W, H, W, H], jnp.float32), (1, 1))
    return TrainBatch(images, gt_boxes, gt_labels, gt_valid, whwh)


def init_variables(name, model, spec, b):
    batch = make_batch(b)
    images, gtb, gtl, gtv, whwh = (batch.images[0], batch.gt_boxes[0],
                                   batch.gt_labels[0], batch.gt_valid[0],
                                   batch.whwh[0])
    hw = (whwh[1], whwh[0])
    cur = images[:1]
    l, me, g = spec.num_local, spec.num_mem, spec.num_global
    rngs = {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)}
    if name == "base":
        return model.init(rngs, cur, hw, gtb[:1], gtl[:1], gtv[:1],
                          train=True)
    if name == "dff":
        return model.init(rngs, cur, images[1:2], hw, gtb[:1], gtl[:1],
                          gtv[:1], method=type(model).train_loss)
    if name == "fgfa":
        return model.init(rngs, cur, images[1:1 + l], hw, gtb[:1], gtl[:1],
                          gtv[:1], method=type(model).train_loss)
    if name == "rdn":
        return model.init(rngs, cur, images[1:1 + l], hw, gtb[0], gtl[0],
                          gtv[0], method=type(model).train_loss)
    if name == "mega":
        return model.init(rngs, cur, images[1:1 + l],
                          images[1 + l:1 + l + me],
                          images[1 + l + me:1 + l + me + g], hw,
                          gtb[0], gtl[0], gtv[0],
                          method=type(model).train_loss_mega)
    if name == "dafa":
        return model.init(rngs, cur, images[1 + l + me:1 + l + me + g],
                          whwh, gtb[:1], gtl[:1], gtv[:1],
                          method=type(model).train_loss)
    raise ValueError(name)


SMALL = dict(pre_nms=128, post_nms=32, pre_nms_train=128, post_nms_train=32)

CASES = [
    ("base", lambda: GeneralizedRCNN(depth=18, num_classes=31,
                                     pre_nms_train=128, post_nms_train=32,
                                     pre_nms_test=128, post_nms_test=32),
     MethodSampleSpec("base"), 1),
    ("dff", lambda: DFFArch(depth=18, num_classes=31, **SMALL),
     MethodSampleSpec("dff", num_local=1, min_offset=-9, max_offset=0), 2),
    ("fgfa", lambda: FGFAArch(depth=18, num_classes=31, **SMALL),
     MethodSampleSpec("fgfa", num_local=2, min_offset=-9, max_offset=9), 3),
    ("rdn", lambda: RDNArch(depth=18, num_classes=31, **SMALL),
     MethodSampleSpec("rdn", num_local=2, min_offset=-18, max_offset=18), 3),
    ("mega", lambda: MEGAArch(depth=18, num_classes=31, memory_size=64,
                              **SMALL),
     MethodSampleSpec("mega", num_local=2, min_offset=-12, max_offset=12,
                      num_mem=1, num_global=1), 5),
    ("dafa", lambda: SparseRCNNDAFA(depth=18, num_classes=30,
                                    num_proposals=32, num_stages=2,
                                    top_k=16, memory_size=64),
     MethodSampleSpec("dafa", num_global=2), 3),
]


@pytest.mark.parametrize("name,make_model,spec,b",
                         CASES, ids=[c[0] for c in CASES])
def test_method_train_step(name, make_model, spec, b):
    model = make_model()
    variables = init_variables(name, model, spec, b)
    params = variables["params"]
    tx = make_optimizer(params, base_lr=1e-4, warmup_iters=0)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = jax.jit(make_method_train_step(model, tx, spec))
    batch = make_batch(b)
    state, metrics = step(state, batch, jax.random.PRNGKey(7))
    total = float(metrics["total_loss"])
    assert np.isfinite(total), (name, metrics)
    assert all(np.isfinite(float(v)) for v in metrics.values()), metrics


def test_loss_decreases_on_fixed_batch():
    """Optimizing a fixed batch must reduce the loss (the 200-iteration
    synthetic criterion, shrunk to stay CI-viable: same-batch descent)."""
    name, make_model, spec, b = CASES[1]  # dff: smallest video method
    model = make_model()
    variables = init_variables(name, model, spec, b)
    params = variables["params"]
    tx = make_optimizer(params, base_lr=5e-4, warmup_iters=0, clip_norm=5.0)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = jax.jit(make_method_train_step(model, tx, spec))
    batch = make_batch(b, seed=3)
    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(8):
        rng, r = jax.random.split(rng)
        state, metrics = step(state, batch, r)
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses
