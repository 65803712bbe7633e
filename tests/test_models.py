"""Model component tests: backbone/FPN shapes, head forward, schedule values,
matcher/criterion behavior — on tiny shapes (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusionvid_tpu.models import (
    ResNet, FPN, DynamicHead, make_schedule, cosine_beta_schedule,
    prepare_diffusion_targets, signal_to_boxes, boxes_to_signal,
    simota_match, set_criterion, sinusoidal_time_embedding, ddim_times,
)

pytestmark = pytest.mark.slow  # model-jitting integration tests (run with -m slow)


def test_resnet_fpn_shapes():
    m = ResNet(depth=50, out_features=("res3", "res4", "res5"), dtype=jnp.float32)
    x = jnp.zeros((1, 64, 96, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out["res3"].shape == (1, 8, 12, 512)
    assert out["res4"].shape == (1, 4, 6, 1024)
    assert out["res5"].shape == (1, 2, 3, 2048)

    fpn = FPN(in_features=("res3", "res4", "res5"), out_channels=256, dtype=jnp.float32)
    fp = fpn.init(jax.random.PRNGKey(1), out)
    pyr = fpn.apply(fp, out)
    assert pyr["p3"].shape == (1, 8, 12, 256)
    assert pyr["p4"].shape == (1, 4, 6, 256)
    assert pyr["p5"].shape == (1, 2, 3, 256)
    assert pyr["p6"].shape == (1, 1, 2, 256)


def test_cosine_schedule_matches_reference_formula():
    betas = cosine_beta_schedule(1000)
    assert betas.shape == (1000,)
    assert betas[0] < 1e-4 and betas[-1] == pytest.approx(0.999, abs=1e-6)
    s = make_schedule()
    ac = np.asarray(s.alphas_cumprod)
    assert 0 < ac[-1] < 1e-4 and ac[0] > 0.999 * (1 - betas[0])
    # identity in float64: sqrt_recip² − sqrt_recipm1² == 1/ᾱ − (1/ᾱ−1) == 1
    ac64 = np.cumprod(1.0 - betas)
    np.testing.assert_allclose(np.sqrt(1 / ac64) ** 2 - np.sqrt(1 / ac64 - 1) ** 2,
                               1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s.sqrt_recip_alphas_cumprod),
                               np.sqrt(1 / ac64), rtol=1e-3)


def test_ddim_times():
    assert ddim_times(1000, 1) == [(999, -1)]
    assert ddim_times(1000, 4) == [(999, 749), (749, 499), (499, 249), (249, -1)]


def test_signal_box_roundtrip():
    whwh = jnp.asarray([[100.0, 80.0, 100.0, 80.0]])
    boxes = jnp.asarray([[[10.0, 10.0, 60.0, 50.0], [0.0, 0.0, 100.0, 80.0]]])
    sig = boxes_to_signal(boxes, whwh, 2.0)
    rec = signal_to_boxes(sig, whwh, 2.0)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(boxes), atol=1e-3)


def test_prepare_targets_static():
    sched = make_schedule()
    rng = jax.random.PRNGKey(0)
    gt = jnp.asarray([[[10.0, 10.0, 60.0, 50.0]] + [[0.0] * 4] * 7])  # [1,8,4]
    valid = jnp.asarray([[True] + [False] * 7])
    whwh = jnp.asarray([[100.0, 80.0, 100.0, 80.0]])
    boxes, t = prepare_diffusion_targets(rng, sched, gt, valid, whwh, 32)
    assert boxes.shape == (1, 32, 4)
    assert t.shape == (1,)
    assert np.isfinite(np.asarray(boxes)).all()
    # Empty-GT image must still produce finite boxes (fake full-image box).
    boxes2, _ = prepare_diffusion_targets(rng, sched, gt, valid & False, whwh, 32)
    assert np.isfinite(np.asarray(boxes2)).all()


def test_time_embedding_shape_and_structure():
    emb = sinusoidal_time_embedding(jnp.asarray([0, 999]), 256)
    assert emb.shape == (2, 256)
    # t=0: sin part 0, cos part 1.
    np.testing.assert_allclose(np.asarray(emb[0, :128]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 128:]), 1.0, atol=1e-6)


def test_simota_matcher_obvious_assignment():
    n, k, g = 32, 5, 3
    rng = np.random.RandomState(0)
    gt_boxes = jnp.asarray([[10.0, 10.0, 30.0, 30.0],
                            [50.0, 50.0, 80.0, 90.0],
                            [0.0, 0.0, 0.0, 0.0]])
    gt_labels = jnp.asarray([1, 3, 0])
    gt_valid = jnp.asarray([True, True, False])
    # Proposals: first two sit exactly on the GTs, rest random far away.
    boxes = np.tile([200.0, 200.0, 220.0, 220.0], (n, 1)).astype(np.float32)
    boxes += rng.uniform(-5, 5, (n, 4)).astype(np.float32)
    boxes[0] = [10, 10, 30, 30]
    boxes[1] = [50, 50, 80, 90]
    logits = np.full((n, k), -4.0, np.float32)
    logits[0, 0] = 4.0   # class 1 → logit idx 0
    logits[1, 2] = 4.0   # class 3 → logit idx 2
    res = simota_match(jnp.asarray(logits), jnp.asarray(boxes), gt_labels,
                       gt_boxes, gt_valid, jnp.asarray([256.0] * 4))
    fg = np.asarray(res.fg)
    mg = np.asarray(res.matched_gt)
    assert fg[0] and mg[0] == 0
    assert fg[1] and mg[1] == 1
    # Invalid GT never matched.
    assert not np.any(mg[fg] == 2)


def test_set_criterion_finite_and_improves_with_match():
    s, b, n, k, g = 2, 1, 16, 5, 4
    rng = np.random.RandomState(1)
    gt_boxes = jnp.zeros((b, g, 4)).at[0, 0].set(jnp.asarray([20.0, 20.0, 60.0, 60.0]))
    gt_labels = jnp.zeros((b, g), jnp.int32).at[0, 0].set(2)
    gt_valid = jnp.zeros((b, g), bool).at[0, 0].set(True)
    whwh = jnp.asarray([[128.0] * 4])

    boxes = jnp.asarray(rng.uniform(0, 128, (s, b, n, 4)).astype(np.float32))
    boxes = boxes.at[..., 2:].set(boxes[..., :2] + 10.0)
    logits = jnp.asarray(rng.randn(s, b, n, k).astype(np.float32))
    total, losses = set_criterion(logits, boxes, gt_labels, gt_boxes, gt_valid,
                                  whwh, k)
    assert np.isfinite(float(total))
    assert "loss_ce" in losses and "loss_ce_0" in losses

    # Perfect prediction in every stage → much lower loss.
    good_boxes = jnp.tile(gt_boxes[:, 0][:, None], (1, n, 1))[None].repeat(s, 0)
    good_logits = jnp.full((s, b, n, k), -8.0).at[..., 1].set(8.0)
    total2, _ = set_criterion(good_logits, good_boxes, gt_labels, gt_boxes,
                              gt_valid, whwh, k)
    assert float(total2) < float(total)


def test_dynamic_head_train_forward():
    b, n, d = 3, 8, 256  # 1 cur + 2 global frames
    head = DynamicHead(num_classes=5, num_heads=2, num_heads_local=1,
                       top_k=(4, 2), dtype=jnp.float32)
    feats = [jnp.ones((b, 16, 16, d)), jnp.ones((b, 8, 8, d))]
    scales = (1 / 8.0, 1 / 16.0)
    boxes = jnp.tile(jnp.asarray([8.0, 8.0, 64.0, 64.0]), (b, n, 1))
    t = jnp.asarray([10, 500, 999])
    rngs = {"params": jax.random.PRNGKey(0), "cfg": jax.random.PRNGKey(1)}
    params = head.init(rngs, feats, scales, boxes, t, num_global=2, train=True)
    logits, pred = head.apply(params, feats, scales, boxes, t, num_global=2,
                              train=True, rngs={"cfg": jax.random.PRNGKey(2)})
    assert logits.shape == (3, b, n, 5)   # 2 shared + 1 cond stages
    assert pred.shape == (3, b, n, 4)
    assert np.isfinite(np.asarray(logits)).all()
    assert np.isfinite(np.asarray(pred)).all()
    # Boxes stay valid (x2>=x1).
    p = np.asarray(pred)
    assert (p[..., 2] >= p[..., 0]).all() and (p[..., 3] >= p[..., 1]).all()


def test_plain_diffusiondet_no_cond_stage():
    """NUM_HEADS_LOCAL=0 (vid_R_101_DiffusionDET.yaml) — no temporal stage."""
    from diffusionvid_tpu.models.diffusion_det import DiffusionDetArch
    model = DiffusionDetArch(depth=50, num_classes=5, num_proposals=8,
                             num_heads=2, num_heads_local=0,
                             compute_dtype=jnp.float32)
    b = 2
    noisy = jnp.tile(jnp.asarray([8.0, 8.0, 60.0, 40.0]), (b, 8, 1))
    t = jnp.zeros((b,), jnp.int32)
    imgs = jnp.zeros((b, 64, 96, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "cfg": jax.random.PRNGKey(1)},
        imgs, noisy, t, num_global=1, train=True)
    logits, boxes = model.apply(variables, imgs, noisy, t, num_global=1,
                                train=True, rngs={"cfg": jax.random.PRNGKey(2)})
    assert logits.shape == (2, b, 8, 5)   # only the 2 shared stages

    feats = model.apply(variables, imgs, method=DiffusionDetArch.extract_features)
    mem = jnp.zeros((16, 256))
    mask = jnp.zeros((16,), bool)
    lg, bx, _ = model.apply(variables, feats, noisy, t, mem, mask,
                            method=DiffusionDetArch.full_forward_test)
    assert lg.shape == (b, 8, 5)
    assert np.isfinite(np.asarray(lg)).all()


def test_stem_s2d_matches_direct_conv():
    """The W-only space-to-depth stem must equal the direct 7x7/s2 conv
    exactly (same arithmetic, reordered).  Even extents take the s2d
    path; odd extents fall back to direct — both checked against the
    direct formulation."""
    from diffusionvid_tpu.models.resnet import StemConv
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.RandomState(0)
    stem = StemConv(features=64, dtype=jnp.float32)

    def direct(x, kw):
        w_hwio = jnp.transpose(kw, (2, 3, 1, 0))
        return lax.conv_general_dilated(
            x, w_hwio, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    for h, w in [(64, 96), (63, 96), (64, 95)]:
        x = jnp.asarray(rng.randn(2, h, w, 3).astype(np.float32))
        params = stem.init(jax.random.PRNGKey(3), x)
        got = stem.apply(params, x)
        ref = direct(x, params["params"]["weight"])
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-5)
