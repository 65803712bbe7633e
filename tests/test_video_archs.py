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
    """LOCAL.PIXEL_ATTEND replacement wiring: the pixel path runs only
    when local box attention is off — local_box_enable = ATTENTION.ENABLE
    and STAGE>0, generalized_rcnn_mega.py:57-58, 608 — and then REPLACES
    the box-relation pipeline: the enhanced map feeds the RPN and the
    pooled features go straight to the global-memory attention
    (update_lm) + predictor.  Structure pins: with stages>0 the flag is
    inert (no pixel params); with stages==0 the pixel+global_lm subtrees
    exist and the enhancement changes the map."""
    from diffusionvid_tpu.models.video_archs import MEGAArch
    cur, refs = imgs[:1], imgs[1:]

    # mutual exclusion: box relation on → pixel flag inert, no params
    inert = MEGAArch(depth=50, num_classes=6, memory_size=32,
                     relation_stages=2, pixel_attend_local=True)
    assert not inert.pixel_replaces_box
    v_inert = _mk(inert, cur, refs, (H, W))
    assert "pixel_attn" not in v_inert["params"]

    on = MEGAArch(depth=50, num_classes=6, memory_size=32,
                  relation_stages=0, pixel_attend_local=True)
    assert on.pixel_replaces_box
    v_on = _mk(on, cur, refs, (H, W), on.init_state())
    assert "pixel_attn" in v_on["params"]
    assert "global_lm" in v_on["params"]
    dets_on = on.apply(v_on, cur, refs, (H, W))
    assert np.isfinite(np.asarray(dets_on.boxes)).all()

    # the enhancement itself is not a no-op on the C4 map, and carries
    # the reference's +ps offset (update_lm_pixel_with_transpose adds ps
    # to the query before the residual, generalized_rcnn_mega.py:93-96)
    def run(m, c, r):
        feats = m.detector.features(jnp.concatenate([c, r], 0))
        cf = feats[:1]
        return cf, m._pixel_enhance(cf, feats)

    cf, ce = on.apply(v_on, cur, refs, method=run)
    assert ce.shape == cf.shape
    assert not np.allclose(np.asarray(cf), np.asarray(ce))


def test_mega_pixel_streaming_call(imgs):
    """pixel_call carries the PixelState through a key frame: global
    pixel cache fills from global frames (select_pixel_ref mode='random'
    update_mem='global'), detections update ext/last_high/irr (mode='box'
    update_mem='local'), and the memories change the output (output
    delta)."""
    from diffusionvid_tpu.models.video_archs import (
        MEGAArch, local_pixel_frame_offsets)
    model = MEGAArch(depth=50, num_classes=6, memory_size=32,
                     relation_stages=0, pixel_attend_local=True,
                     pixel_attend_global=True, pixel_mem_size=64,
                     pixel_ext_cap=128)
    cur, refs = imgs[:1], imgs[1:]
    state = model.init_state()
    v = _mk(model, cur, refs, (H, W), state)
    pstate = model.init_pixel_state()
    pstate2 = model.apply(v, pstate, imgs,
                          method=MEGAArch.update_global_pixels)
    assert int(pstate2.gpix.count) > 0
    assert np.asarray(pstate2.irr_g_valid).any()

    offs = local_pixel_frame_offsets(interval=9, key_location=4)
    assert offs == [-4, -2, -1, 0, 1, 2, 4]
    rvalid = jnp.ones((len(imgs[1:]),), bool)
    dets, pstate3 = model.apply(v, cur, refs, rvalid[: refs.shape[0]],
                                (H, W), state, pstate2,
                                method=MEGAArch.pixel_call)
    assert np.isfinite(np.asarray(dets.boxes)).all()
    assert np.asarray(pstate3.irr_valid).any()     # irr refreshed

    # output delta: a filled global pixel cache changes the detections
    dets0, _ = model.apply(v, cur, refs, rvalid[: refs.shape[0]],
                           (H, W), state, pstate,
                           method=MEGAArch.pixel_call)
    assert not np.allclose(np.asarray(dets.scores), np.asarray(dets0.scores))


def test_mega_train_loss_pixel_attend(imgs):
    """The train-side pixel path (generalized_rcnn_mega.py:352-363:
    sparse=0.25 over ALL local maps incl. cur, pixels_irr keys) replaces
    the relation refs and produces finite losses."""
    from diffusionvid_tpu.models.video_archs import MEGAArch
    model = MEGAArch(depth=50, num_classes=6, memory_size=32,
                     post_nms_train=32, relation_stages=0,
                     pixel_attend_local=True)
    cur, refs = imgs[:1], imgs[1:]
    gt_boxes = jnp.asarray([[4.0, 4.0, 40.0, 30.0]])
    gt_labels = jnp.asarray([2], jnp.int32)
    gt_valid = jnp.asarray([True])
    rngs = {"params": jax.random.PRNGKey(0),
            "sampler": jax.random.PRNGKey(1)}
    variables = model.init(rngs, cur, refs, None, None, (H, W),
                           gt_boxes, gt_labels, gt_valid,
                           method=MEGAArch.train_loss_mega)
    assert "pixel_attn" in variables["params"]
    losses = model.apply(variables, cur, refs, None, None, (H, W),
                         gt_boxes, gt_labels, gt_valid,
                         method=MEGAArch.train_loss_mega,
                         rngs={"sampler": jax.random.PRNGKey(2)})
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
