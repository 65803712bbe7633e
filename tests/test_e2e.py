"""End-to-end slices on a tiny model: train step (single + 8-device DP mesh)
and streaming video inference.  The reference has no equivalent tests
(SURVEY.md §4) — this is the deterministic fake-data integration layer."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusionvid_tpu.models.diffusion_det import DiffusionDetArch
from diffusionvid_tpu.engine import (
    TrainBatch, TrainState, make_optimizer, make_train_step, StreamingDetector,
)
from diffusionvid_tpu.parallel import make_mesh, make_dp_train_step, shard_batch_pytree, replicate

pytestmark = pytest.mark.slow  # model-jitting integration tests (run with -m slow)


H, W = 64, 96
NUM_GLOBAL = 2
B = 1 + NUM_GLOBAL
G = 4
PROPS = 16


def tiny_model():
    return DiffusionDetArch(
        depth=50, num_classes=5, num_proposals=PROPS, hidden_dim=256,
        num_heads=1, num_heads_local=1, compute_dtype=jnp.float32)


def tiny_batch(s, seed=0):
    rng = np.random.RandomState(seed)
    images = rng.uniform(0, 255, (s, B, H, W, 3)).astype(np.float32)
    gt_boxes = np.zeros((s, B, G, 4), np.float32)
    gt_boxes[..., 0, :] = [10, 10, 50, 40]
    gt_labels = np.zeros((s, B, G), np.int32)
    gt_labels[..., 0] = 2
    gt_valid = np.zeros((s, B, G), bool)
    gt_valid[..., 0] = True
    whwh = np.tile([W, H, W, H], (s, 1)).astype(np.float32)
    return TrainBatch(*(jnp.asarray(a) for a in
                        (images, gt_boxes, gt_labels, gt_valid, whwh)))


@pytest.fixture(scope="module")
def model_and_params():
    model = tiny_model()
    batch = tiny_batch(1)
    noisy = jnp.tile(jnp.asarray([8.0, 8.0, 60.0, 40.0]), (B, PROPS, 1))
    t = jnp.zeros((B,), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "cfg": jax.random.PRNGKey(1)},
        batch.images[0], noisy, t, num_global=NUM_GLOBAL, train=True)
    return model, variables["params"]


def test_train_step_updates_params(model_and_params):
    model, params = model_and_params
    tx = make_optimizer(params, base_lr=1e-4, warmup_iters=0)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    step = make_train_step(model, tx, NUM_GLOBAL)

    batch = tiny_batch(2)
    new_state, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["total_loss"]))
    # params changed
    before = jax.tree_util.tree_leaves(state.params)[0]
    after = jax.tree_util.tree_leaves(new_state.params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    # frozen BN statistics unchanged
    bs = state.params["backbone"]["bn1"]["running_mean"]
    bs2 = new_state.params["backbone"]["bn1"]["running_mean"]
    np.testing.assert_array_equal(np.asarray(bs), np.asarray(bs2))


def test_dp_mesh_train_step(model_and_params):
    model, params = model_and_params
    assert jax.device_count() >= 8, "conftest should provide 8 CPU devices"
    mesh = make_mesh(8)
    tx = make_optimizer(params, base_lr=1e-4, warmup_iters=0)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = make_train_step(model, tx, NUM_GLOBAL)
    dp_step = make_dp_train_step(mesh, step)

    batch = shard_batch_pytree(mesh, tiny_batch(8))
    state = replicate(mesh, state)
    new_state, metrics = dp_step(state, batch, jnp.asarray(jax.random.PRNGKey(7)))
    assert np.isfinite(float(metrics["total_loss"]))


def test_sharded_eval_matches_replicated(model_and_params):
    """DP-sharded inference must be numerically equivalent to the
    single-program run (the eval half of SURVEY.md §2.3; this check used
    to live inside __graft_entry__._dryrun_body — moved here so the
    driver dryrun pays one compile, not two)."""
    from diffusionvid_tpu.models.diffusion_det import signal_to_boxes
    from diffusionvid_tpu.parallel import dp_shardings

    model, params = model_and_params
    mesh = make_mesh(8)
    n_frames = 8
    whwh = jnp.asarray([W, H, W, H], jnp.float32)
    rng = np.random.RandomState(3)
    frames = jnp.asarray(rng.uniform(0, 255, (n_frames, H, W, 3)),
                         jnp.float32)
    boxes0 = signal_to_boxes(
        jax.random.normal(jax.random.PRNGKey(9), (n_frames, PROPS, 4)),
        whwh, 2.0)
    t999 = jnp.full((n_frames,), 999, jnp.int32)

    def eval_fn(v, fr, bx, t):
        feats = model.apply(v, fr, method=DiffusionDetArch.extract_features)
        logits, pboxes, _, _, _ = model.apply(
            v, feats, bx, t, method=DiffusionDetArch.extract_proposals)
        return logits[-1], pboxes[-1]

    rep, bsh = dp_shardings(mesh)
    with mesh:
        sharded = jax.jit(eval_fn, in_shardings=(rep, bsh, bsh, bsh),
                          out_shardings=(bsh, bsh))
        lg_s, bx_s = jax.device_get(
            sharded({"params": params}, frames, boxes0, t999))
    lg_r, bx_r = jax.device_get(jax.jit(eval_fn)(
        {"params": params}, frames, boxes0, t999))
    assert np.abs(lg_s - lg_r).max() < 1e-3
    assert np.abs(bx_s - bx_r).max() < 1e-2


def test_streaming_inference(model_and_params):
    model, params = model_and_params
    det = StreamingDetector(
        model, {"params": params}, infer_batch=2, sample_step=1, mem_size=32,
        mem_dis_size=8, num_proposals=PROPS, detections_per_img=PROPS)
    whwh = jnp.asarray([W, H, W, H], jnp.float32)
    rng = np.random.RandomState(1)
    gframes = jnp.asarray(rng.uniform(0, 255, (4, H, W, 3)).astype(np.float32))
    state = det.start_video(jax.random.PRNGKey(0), gframes, whwh)
    assert int(state.mem.count) == 32  # 4 frames × k1 > capacity → full

    frames = jnp.asarray(rng.uniform(0, 255, (2, H, W, 3)).astype(np.float32))
    state, dets = det.process_chunk(state, frames, whwh)
    assert dets.boxes.shape == (2, PROPS, 4)
    assert dets.valid.dtype == np.bool_
    b = np.asarray(dets.boxes)
    assert np.isfinite(b).all()
    assert (b[..., 2] >= b[..., 0]).all()
    # second chunk reuses the compiled function and the memory
    state2, dets2 = det.process_chunk(state, frames, whwh)
    assert np.isfinite(np.asarray(dets2.scores)).all()


def test_streaming_multistep_ensemble(model_and_params):
    model, params = model_and_params
    det = StreamingDetector(
        model, {"params": params}, infer_batch=2, sample_step=4, mem_size=32,
        mem_dis_size=8, num_proposals=PROPS, detections_per_img=PROPS)
    whwh = jnp.asarray([W, H, W, H], jnp.float32)
    state = det.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(2)
    frames = jnp.asarray(rng.uniform(0, 255, (2, H, W, 3)).astype(np.float32))
    state, dets = det.process_chunk(state, frames, whwh)
    # ensemble: 4 steps × PROPS selections per frame
    assert dets.boxes.shape == (2, 4 * PROPS, 4)
    assert np.isfinite(np.asarray(dets.boxes)).all()
