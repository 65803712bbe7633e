"""MEGA-family meta-arch tests on tiny shapes: FlowNet/warp numerics and
each architecture's forward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusionvid_tpu.models.flownet import (
    FlowNetS, warp_features, grid_sample_bilinear, EmbedNet,
)

pytestmark = pytest.mark.slow  # model-jitting integration tests (run with -m slow)

H, W = 64, 96


def test_warp_identity_and_shift():
    feat = jnp.arange(1 * 4 * 6 * 2, dtype=jnp.float32).reshape(1, 4, 6, 2)
    zero_flow = jnp.zeros((1, 4, 6, 2))
    np.testing.assert_allclose(np.asarray(warp_features(feat, zero_flow)),
                               np.asarray(feat), atol=1e-6)
    # flow dx=+1 shifts sampling right: out[y,x] = feat[y, x+1]
    flow = jnp.zeros((1, 4, 6, 2)).at[..., 0].set(1.0)
    out = np.asarray(warp_features(feat, flow))
    np.testing.assert_allclose(out[0, :, :5], np.asarray(feat)[0, :, 1:], atol=1e-6)
    # out-of-range samples are zero
    np.testing.assert_allclose(out[0, :, 5], 0.0)


def test_flownet_output_resolution():
    model = FlowNetS(predict_scale=True, dtype=jnp.float32)
    pair = jnp.zeros((1, H, W, 6))
    params = model.init(jax.random.PRNGKey(0), pair)
    flow, scale = model.apply(params, pair)
    assert flow.shape[:3] == (1, H // 16, W // 16)
    assert flow.shape[-1] == 2
    assert scale.shape == (1, H // 16, W // 16, 1024)
    # zero-init scale conv → scale map starts at exactly 1
    np.testing.assert_allclose(np.asarray(scale).min(), np.asarray(scale).max())


def test_relation_attention_shapes():
    from diffusionvid_tpu.models.relation import (
        RelationStack, position_matrix, position_embedding)
    r0, r1 = np.random.RandomState(0), np.random.RandomState(1)
    boxes = r0.uniform(0, 50, (8, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + r0.uniform(2, 30, (8, 2))
    refs = r1.uniform(0, 50, (12, 4)).astype(np.float32)
    refs[:, 2:] = refs[:, :2] + r1.uniform(2, 30, (12, 2))
    boxes, refs = jnp.asarray(boxes), jnp.asarray(refs)
    pm = position_matrix(boxes, refs)
    assert pm.shape == (8, 12, 4)
    emb = position_embedding(pm, 64)
    assert emb.shape == (8, 12, 64)

    stack = RelationStack(num_stages=2, feat_dim=64, groups=4, dtype=jnp.float32)
    feat = jnp.ones((8, 64))
    ref_feat = jnp.ones((12, 64))
    params = stack.init(jax.random.PRNGKey(0), feat, ref_feat, boxes, refs)
    out = stack.apply(params, feat, ref_feat, boxes, refs,
                      jnp.ones((12,), bool))
    assert out.shape == (8, 64)
    assert np.isfinite(np.asarray(out)).all()


@pytest.fixture(scope="module")
def imgs():
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.uniform(0, 255, (3, H, W, 3)).astype(np.float32))


def _mk(model, *args, rngs_extra=None):
    rngs = {"params": jax.random.PRNGKey(0)}
    if rngs_extra:
        rngs.update(rngs_extra)
    return model.init(rngs, *args)


def test_dff_arch(imgs):
    from diffusionvid_tpu.models.video_archs import DFFArch
    model = DFFArch(depth=50, num_classes=6)
    key, cur = imgs[:1], imgs[1:2]
    variables = _mk(model, key, cur, (H, W))
    dets = model.apply(variables, key, cur, (H, W))
    assert dets.boxes.shape[0] == 1
    assert np.isfinite(np.asarray(dets.boxes)).all()


def test_fgfa_arch(imgs):
    from diffusionvid_tpu.models.video_archs import FGFAArch
    model = FGFAArch(depth=50, num_classes=6)
    cur, refs = imgs[:1], imgs  # refs include cur as last frame
    variables = _mk(model, cur, refs, (H, W))
    dets = model.apply(variables, cur, refs, (H, W))
    assert np.isfinite(np.asarray(dets.boxes)).all()


def test_rdn_arch(imgs):
    from diffusionvid_tpu.models.video_archs import RDNArch
    model = RDNArch(depth=50, num_classes=6)
    cur, refs = imgs[:1], imgs[1:]
    variables = _mk(model, cur, refs, (H, W))
    dets = model.apply(variables, cur, refs, (H, W))
    assert np.isfinite(np.asarray(dets.boxes)).all()


def test_mega_arch_with_memory(imgs):
    from diffusionvid_tpu.models.video_archs import MEGAArch
    model = MEGAArch(depth=50, num_classes=6, memory_size=32)
    cur, refs = imgs[:1], imgs[1:]
    variables = _mk(model, cur, refs, (H, W))

    state = model.init_state()
    feats, valid = model.apply(variables, imgs, (H, W),
                               method=MEGAArch.memory_features)
    state = model.apply(variables, state, feats, valid,
                        method=MEGAArch.update_memory)
    assert int(state.mem.count) > 0

    dets = model.apply(variables, cur, refs, (H, W), state=state)
    assert np.isfinite(np.asarray(dets.boxes)).all()


def test_mega_arch_stage_memory(imgs):
    """Per-stage long-range memory rings (update_memory/mem[i],
    roi_box_feature_extractors.py:1112-1140): rings fill frame by frame
    and feed stage-specific attention keys."""
    from diffusionvid_tpu.models.video_archs import MEGAArch
    model = MEGAArch(depth=50, num_classes=6, memory_size=32,
                     use_stage_mem=True, mem_frames=3)
    cur, refs = imgs[:1], imgs[1:]
    variables = _mk(model, cur, refs, (H, W))

    state = model.init_state()
    assert state.stage_feats.shape == (model.relation_stages,
                                       3 * model.ref_slots, model.feat_dim)
    feats, valid = model.apply(variables, imgs, (H, W),
                               method=MEGAArch.memory_features)
    state = model.apply(variables, state, feats, valid,
                        method=MEGAArch.update_memory)

    dets, state = model.apply(variables, cur, refs, (H, W), state=state,
                              return_state=True)
    assert np.isfinite(np.asarray(dets.boxes)).all()
    assert (np.asarray(state.stage_count) == model.ref_slots).all()
    # second frame: rings advance, detection still clean
    dets2, state = model.apply(variables, cur, refs, (H, W), state=state,
                               return_state=True)
    assert (np.asarray(state.stage_count) == 2 * model.ref_slots).all()
    assert np.isfinite(np.asarray(dets2.boxes)).all()
    # stage memory contains data (ring slots written)
    assert float(np.abs(np.asarray(state.stage_feats)).sum()) > 0


def test_mega_arch_pixel_attend(imgs):
    """LOCAL.PIXEL_ATTEND wiring (generalized_rcnn_mega.py:75-130): the
    current frame's C4 map is enhanced by pixel attention over the local
    refs before RPN/pooling.  Checks the param subtree appears, the
    forward stays finite, and the flag actually changes the output."""
    from diffusionvid_tpu.models.video_archs import MEGAArch
    cur, refs = imgs[:1], imgs[1:]

    on = MEGAArch(depth=50, num_classes=6, memory_size=32,
                  pixel_attend_local=True)
    v_on = _mk(on, cur, refs, (H, W))
    assert "pixel_attn" in v_on["params"]
    dets_on = on.apply(v_on, cur, refs, (H, W))
    assert np.isfinite(np.asarray(dets_on.boxes)).all()

    # the enhancement itself is not a no-op on the C4 map (the
    # postprocessed scores can coincide within allclose tolerance at
    # random init, so assert at the feature level)
    def run(m, c, r):
        feats = m.detector.features(jnp.concatenate([c, r], 0))
        cf, rf = feats[:1], feats[1:]
        return cf, m._pixel_enhance(cf, rf)

    cf, ce = on.apply(v_on, cur, refs, method=run)
    assert ce.shape == cf.shape
    assert not np.allclose(np.asarray(cf), np.asarray(ce))


def test_mega_train_loss_pixel_attend(imgs):
    """PIXEL_ATTEND also runs in the training path (train_loss_mega →
    train_loss) and produces finite, differentiable losses."""
    from diffusionvid_tpu.models.video_archs import MEGAArch
    model = MEGAArch(depth=50, num_classes=6, memory_size=32,
                     post_nms_train=32, pixel_attend_local=True)
    cur, refs = imgs[:1], imgs[1:]
    gt_boxes = jnp.asarray([[4.0, 4.0, 40.0, 30.0]])
    gt_labels = jnp.asarray([2], jnp.int32)
    gt_valid = jnp.asarray([True])
    rngs = {"params": jax.random.PRNGKey(0),
            "sampler": jax.random.PRNGKey(1)}
    variables = model.init(rngs, cur, refs, None, None, (H, W),
                           gt_boxes, gt_labels, gt_valid,
                           method=MEGAArch.train_loss_mega)
    losses = model.apply(variables, cur, refs, None, None, (H, W),
                         gt_boxes, gt_labels, gt_valid,
                         method=MEGAArch.train_loss_mega,
                         rngs={"sampler": jax.random.PRNGKey(2)})
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
