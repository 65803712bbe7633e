"""Config keys must drive model structure — not parse into nothing.

Round-3 verdict found ATTENTION.STAGE / ATTENTION.ADVANCED_STAGE /
ATTENTION.ENABLE / SHUFFLED_CUR_TEST were accepted-and-ignored.  These
tests pin that (a) the builder threads each key into the built module,
and (b) a non-default value changes the computed outputs, so a future
refactor can't silently disconnect them again.

Reference semantics:
  - ATTENTION.STAGE → base relation stages
    (roi_box_feature_extractors.py:333-337, MEGA config uses 3)
  - ATTENTION.ADVANCED_STAGE + RDN.RATIO → RDN distillation stage,
    advanced_num = REF_POST_NMS_TOP_N · RATIO
    (roi_box_feature_extractors.py:334-347, 406-427)
  - ATTENTION.ENABLE → decoder local temporal attention
    (box_head.py:184-194, 359-365)
  - MEGA.SHUFFLED_CUR_TEST → shuffled frame visiting order with the
    local queue reduced to the current frame (vid_mega.py:13-14, 166-186)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusionvid_tpu.config import load_config
from diffusionvid_tpu.models.detectors import build_detection_model


def _cfg(path):
    return load_config(path)


def test_rdn_config_builds_advanced_stage():
    cfg = _cfg("configs/RDN/vid_R_101_C4_RDN_1x.yaml")
    assert cfg.MODEL.VID.ROI_BOX_HEAD.ATTENTION.ADVANCED_STAGE == 1
    model = build_detection_model(cfg)
    assert model.relation_stages == cfg.MODEL.VID.ROI_BOX_HEAD.ATTENTION.STAGE
    assert model.advanced_stages == 1
    # advanced_num = REF_POST_NMS_TOP_N * RDN.RATIO = 75 * 0.2
    assert model.advanced_num == 15
    assert model.ref_post_nms == 75


def test_rdn_base_config_builds_no_advanced_stage():
    cfg = _cfg("configs/RDN/vid_R_101_C4_RDN_base_1x.yaml")
    model = build_detection_model(cfg)
    assert model.advanced_stages == 0


def test_mega_config_attention_stage_wired():
    cfg = _cfg("configs/MEGA/vid_R_101_C4_MEGA_1x.yaml")
    assert cfg.MODEL.VID.ROI_BOX_HEAD.ATTENTION.STAGE == 3
    model = build_detection_model(cfg)
    assert model.relation_stages == 3


def test_diffusionvid_attention_enable_wired():
    cfg = _cfg("configs/vid_R_101_DiffusionVID.yaml")
    model = build_detection_model(cfg)
    if cfg.MODEL.VID.ROI_BOX_HEAD.ATTENTION.ENABLE:
        assert model.local_stages == cfg.MODEL.VID.ROI_BOX_HEAD.ATTENTION.STAGE
    else:
        assert model.local_stages == 0
    cfg2 = _cfg("configs/vid_R_101_DiffusionVID.yaml")
    cfg2.MODEL.VID.ROI_BOX_HEAD.ATTENTION.ENABLE = True
    cfg2.MODEL.VID.ROI_BOX_HEAD.ATTENTION.STAGE = 2
    model2 = build_detection_model(cfg2)
    assert model2.local_stages == 2


def _boxes(rng, n, lo=0.0, hi=50.0):
    b = rng.uniform(lo, hi, (n, 4)).astype(np.float32)
    b[:, 2:] = b[:, :2] + rng.uniform(2, 30, (n, 2))
    return jnp.asarray(b)


def test_relation_advanced_stage_changes_output():
    """ADVANCED_STAGE=1 must add parameters AND change the forward."""
    from diffusionvid_tpu.models.relation import RelationStack
    rng = np.random.RandomState(0)
    gs = 6                      # ref group size (stands in for 75)
    n, m, d = 8, 2 * gs, 64
    feat = jnp.asarray(rng.randn(n, d).astype(np.float32))
    ref = jnp.asarray(rng.randn(m, d).astype(np.float32))
    boxes, refs = _boxes(rng, n), _boxes(rng, m)

    base = RelationStack(num_stages=2, feat_dim=d, groups=4,
                         dtype=jnp.float32)
    adv = RelationStack(num_stages=2, feat_dim=d, groups=4,
                        advanced_stages=1, advanced_num=2, group_size=gs,
                        dtype=jnp.float32)
    pb = base.init(jax.random.PRNGKey(0), feat, ref, boxes, refs)
    pa = adv.init(jax.random.PRNGKey(0), feat, ref, boxes, refs)
    # structure: advanced stage adds attn2 (distill) + fc2 + attn3 (final)
    extra = set(pa["params"]) - set(pb["params"])
    assert {"attn2", "fc2", "attn3"} == extra
    ob = base.apply(pb, feat, ref, boxes, refs)
    oa = adv.apply(pa, feat, ref, boxes, refs)
    assert np.isfinite(np.asarray(oa)).all()
    assert not np.allclose(np.asarray(ob), np.asarray(oa))


def test_relation_stage_count_changes_structure():
    from diffusionvid_tpu.models.relation import RelationStack
    rng = np.random.RandomState(1)
    n, m, d = 4, 6, 32
    feat = jnp.asarray(rng.randn(n, d).astype(np.float32))
    ref = jnp.asarray(rng.randn(m, d).astype(np.float32))
    boxes, refs = _boxes(rng, n), _boxes(rng, m)
    p3 = RelationStack(num_stages=3, feat_dim=d, groups=4,
                       dtype=jnp.float32).init(
        jax.random.PRNGKey(0), feat, ref, boxes, refs)
    assert {"attn0", "attn1", "attn2", "fc0", "fc1", "fc2"} <= set(
        p3["params"])


@pytest.mark.slow  # DynamicHead jit: 13-19 s each (suite budget)
def test_dynamic_head_local_attention_semantics():
    """ATTENTION.ENABLE: the local chain adds params, and — matching the
    reference's adaptive-norm data flow (box_head.py:361-385: the global
    loop recomputes ``attn_`` from the unchanged ``query_``, discarding
    the local result) — it only drives the conditioned stage when the
    global chain is OFF."""
    from diffusionvid_tpu.models.heads import DynamicHead
    b, n, d = 3, 8, 256
    feats = [jnp.ones((b, 16, 16, d)), jnp.ones((b, 8, 8, d))]
    scales = (1 / 8.0, 1 / 16.0)
    boxes = jnp.tile(jnp.asarray([8.0, 8.0, 64.0, 64.0]), (b, n, 1))
    t = jnp.asarray([10, 500, 999])
    rngs = {"params": jax.random.PRNGKey(0), "cfg": jax.random.PRNGKey(1)}

    off = DynamicHead(num_classes=5, num_heads=2, num_heads_local=1,
                      top_k=(4, 2), dtype=jnp.float32)
    on = DynamicHead(num_classes=5, num_heads=2, num_heads_local=1,
                     top_k=(4, 2), local_stages=2, dtype=jnp.float32)
    p_off = off.init(rngs, feats, scales, boxes, t, num_global=2, train=True)
    p_on = on.init(rngs, feats, scales, boxes, t, num_global=2, train=True)
    extra = set(p_on["params"]) - set(p_off["params"])
    assert {"local_attn0", "local_attn1",
            "local_norm0", "local_norm1"} == extra

    kw = dict(num_global=2, train=False)
    lo_off, _ = off.apply(p_off, feats, scales, boxes, t, **kw)
    lo_on, _ = on.apply(p_on, feats, scales, boxes, t, **kw)
    assert np.isfinite(np.asarray(lo_on)).all()
    # global chain ON → local result overwritten, outputs identical
    # (reference parity; XLA dead-code-eliminates the local chain)
    np.testing.assert_allclose(np.asarray(lo_off[-1]), np.asarray(lo_on[-1]),
                               atol=1e-6)

    # global chain OFF → the local chain is the conditioning signal, so
    # it must change the conditioned-stage outputs
    solo = DynamicHead(num_classes=5, num_heads=2, num_heads_local=1,
                       top_k=(4, 2), local_stages=2, global_enable=False,
                       dtype=jnp.float32)
    p_solo = solo.init(rngs, feats, scales, boxes, t, num_global=2,
                       train=True)
    lo_solo, _ = solo.apply(p_solo, feats, scales, boxes, t, **kw)
    assert np.isfinite(np.asarray(lo_solo)).all()
    assert not np.allclose(np.asarray(lo_solo[-1]), np.asarray(lo_on[-1]))


@pytest.mark.slow  # DynamicHead jit: 13-19 s each (suite budget)
def test_dynamic_head_global_disable_requires_local():
    """GLOBAL.ENABLE=False without a local chain has no conditioning
    signal — must raise rather than silently skip (box_head.py:361-394:
    attn_ comes from either chain)."""
    from diffusionvid_tpu.models.heads import DynamicHead
    b, n, d = 2, 6, 256
    feats = [jnp.ones((b, 16, 16, d)), jnp.ones((b, 8, 8, d))]
    scales = (1 / 8.0, 1 / 16.0)
    boxes = jnp.tile(jnp.asarray([8.0, 8.0, 64.0, 64.0]), (b, n, 1))
    t = jnp.asarray([10, 500])
    rngs = {"params": jax.random.PRNGKey(0), "cfg": jax.random.PRNGKey(1)}

    bad = DynamicHead(num_classes=5, num_heads=2, num_heads_local=1,
                      top_k=(4, 2), global_enable=False, dtype=jnp.float32)
    with pytest.raises(ValueError, match="conditioning"):
        bad.init(rngs, feats, scales, boxes, t, num_global=2, train=True)

    ok = DynamicHead(num_classes=5, num_heads=2, num_heads_local=1,
                     top_k=(4, 2), global_enable=False, local_stages=1,
                     dtype=jnp.float32)
    p = ok.init(rngs, feats, scales, boxes, t, num_global=2, train=True)
    assert "global_attn0" not in p["params"]
    logits, pred = ok.apply(p, feats, scales, boxes, t, num_global=2,
                            train=False)
    assert np.isfinite(np.asarray(logits)).all()


def test_shuffled_cur_rejects_non_mega():
    from diffusionvid_tpu.engine.inference_mega import (
        run_inference_video_arch)
    with pytest.raises(ValueError, match="SHUFFLED_CUR_TEST"):
        run_inference_video_arch(None, {}, None, None, method="base",
                                 shuffled_cur=True)


@pytest.mark.slow  # DynamicHead jit: 13-19 s each (suite budget)
def test_dynamic_head_local_train_frame_slicing():
    """ATTENTION.ENABLE training slices the conditioned stage's queries/
    features/time to the local frames (local_interval=3, box_head.py:
    341-346) and returns EVERY stage's outputs sliced to them (:429-431)
    — losses land on the local frames only.  Inference is unsliced."""
    from diffusionvid_tpu.models.heads import DynamicHead
    b, n, d = 5, 8, 256
    feats = [jnp.ones((b, 16, 16, d)), jnp.ones((b, 8, 8, d))]
    scales = (1 / 8.0, 1 / 16.0)
    boxes = jnp.tile(jnp.asarray([8.0, 8.0, 64.0, 64.0]), (b, n, 1))
    t = jnp.asarray([10, 200, 400, 600, 999])
    rngs = {"params": jax.random.PRNGKey(0), "cfg": jax.random.PRNGKey(1)}

    on = DynamicHead(num_classes=5, num_heads=2, num_heads_local=1,
                     top_k=(4, 2), local_stages=1, dtype=jnp.float32)
    p = on.init(rngs, feats, scales, boxes, t, num_global=2, train=True)
    lg, bx = on.apply(p, feats, scales, boxes, t, num_global=2, train=True,
                      rngs={"cfg": jax.random.PRNGKey(2)})
    assert lg.shape[1] == 3 and bx.shape[1] == 3    # sliced to local frames
    lg_i, bx_i = on.apply(p, feats, scales, boxes, t, num_global=2,
                          train=False)
    assert lg_i.shape[1] == b and bx_i.shape[1] == b

    # flagship (local attention off): no slicing at train either
    off = DynamicHead(num_classes=5, num_heads=2, num_heads_local=1,
                      top_k=(4, 2), dtype=jnp.float32)
    p_off = off.init(rngs, feats, scales, boxes, t, num_global=2, train=True)
    lg_o, _ = off.apply(p_off, feats, scales, boxes, t, num_global=2,
                        train=True, rngs={"cfg": jax.random.PRNGKey(2)})
    assert lg_o.shape[1] == b
