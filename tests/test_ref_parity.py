"""Golden parity against the REFERENCE'S OWN code (not a hand-written twin).

``ref_oracle`` imports /root/reference's actual modules under CPU torch
(minimal shims for torchvision/fvcore/detectron2, see ref_oracle.py), so
these tests pin the rebuild to ``mega_core`` itself:

  * DDIM schedule constants — mega_core/modeling/detector/diffusion_det.py
    cosine_beta_schedule + derived buffers (lines 50-70, 219-247)
  * simOTA matcher — HungarianMatcherDynamicK
    (mega_core/modeling/roi_heads/box_head/loss.py:508-688)
  * set-criterion losses — SetCriterionDynamicK (loss.py:255-505)
  * box coder — mega_core/modeling/box_coder.py
  * seq-NMS — /root/reference/seq_nms.py:38-225
  * VID AP + proposal recall — vid_eval.py:85-354

A shared misreading of the reference cannot pass here: the right-hand
side executes the reference's files byte-for-byte.
"""

import numpy as np
import pytest

import ref_oracle

if not ref_oracle.ref_available():  # pragma: no cover
    pytest.skip("/root/reference not present", allow_module_level=True)

torch = pytest.importorskip("torch")
REF = ref_oracle.load()

import jax
import jax.numpy as jnp


# --------------------------------------------------------------- helpers

def _rand_boxes(rng, n, w, h, min_side=6.0, max_side=120.0):
    x1 = rng.uniform(0, w - max_side, n)
    y1 = rng.uniform(0, h - max_side, n)
    bw = rng.uniform(min_side, max_side, n)
    bh = rng.uniform(min_side, max_side, n)
    return np.stack([x1, y1, x1 + bw, y1 + bh], -1).astype(np.float32)


def _targets_ref(gt_boxes, gt_labels, w, h):
    """Build one reference target dict (diffusion_det.py prepare_targets)."""
    t = {}
    whwh = torch.tensor([w, h, w, h], dtype=torch.float32)
    xyxy = torch.as_tensor(gt_boxes)
    cxcywh = REF.loss.box_xyxy_to_cxcywh(xyxy)
    t["labels"] = torch.as_tensor(gt_labels, dtype=torch.int64)
    t["boxes"] = cxcywh / whwh
    t["boxes_xyxy"] = xyxy
    t["image_size_xyxy"] = whwh
    t["image_size_xyxy_tgt"] = whwh.unsqueeze(0).repeat(len(gt_labels), 1)
    return t


class _NS(dict):
    __getattr__ = dict.__getitem__


def _ref_cfg():
    return _NS(MODEL=_NS(DiffusionDet=_NS(
        USE_FED_LOSS=False, OTA_K=5, ALPHA=0.25, GAMMA=2.0)))


def _ref_matcher():
    return REF.loss.HungarianMatcherDynamicK(
        _ref_cfg(), cost_class=2.0, cost_bbox=5.0, cost_giou=2.0,
        use_focal=True)


# -------------------------------------------------------------- schedule

def test_schedule_constants_match_reference():
    """cosine_beta_schedule + every derived buffer the sampler reads
    (diffusion_det.py:50-70 and the register_buffer block)."""
    from diffusionvid_tpu.models.diffusion_det import (
        cosine_beta_schedule, make_schedule)

    ref_betas = REF.diffusion_det.cosine_beta_schedule(1000).numpy()
    ours = cosine_beta_schedule(1000)
    np.testing.assert_allclose(ours, ref_betas, rtol=1e-6, atol=1e-8)

    # derived buffers are stored fp32 (device constants); the cumprod
    # accumulates ~1000 fp32 roundings, so compare at fp32 tolerance
    alphas = 1.0 - ref_betas
    ac = np.cumprod(alphas)
    sched = make_schedule(1000)
    np.testing.assert_allclose(np.asarray(sched.alphas_cumprod), ac,
                               rtol=5e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(sched.sqrt_alphas_cumprod),
                               np.sqrt(ac), rtol=5e-4, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(sched.sqrt_one_minus_alphas_cumprod),
        np.sqrt(1.0 - ac), rtol=5e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(sched.sqrt_recip_alphas_cumprod),
                               np.sqrt(1.0 / ac), rtol=5e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sched.sqrt_recipm1_alphas_cumprod),
                               np.sqrt(1.0 / ac - 1.0), rtol=5e-4, atol=1e-6)


# --------------------------------------------------------------- matcher

@pytest.mark.parametrize("seed,n,g", [(0, 64, 4), (1, 128, 7), (2, 96, 1),
                                      (3, 200, 12)])
def test_simota_matcher_matches_reference(seed, n, g):
    """Same random inputs through HungarianMatcherDynamicK (loss.py:508-688)
    and our static-shape simota_match: identical fg set and gt assignment."""
    from diffusionvid_tpu.models.criterion import simota_match

    rng = np.random.RandomState(seed)
    w, h = 640.0, 480.0
    k = 30
    logits = rng.randn(n, k).astype(np.float32)
    boxes = _rand_boxes(rng, n, w, h)
    gt_boxes = _rand_boxes(rng, g, w, h)
    gt_labels = rng.randint(1, k + 1, g)

    outputs = {"pred_logits": torch.as_tensor(logits).unsqueeze(0),
               "pred_boxes": torch.as_tensor(boxes).unsqueeze(0)}
    targets = [_targets_ref(gt_boxes, gt_labels, w, h)]
    (indices, _) = _ref_matcher()(outputs, targets)
    ref_fg = indices[0][0].numpy()
    ref_gt = indices[0][1].numpy()

    m = simota_match(jnp.asarray(logits), jnp.asarray(boxes),
                     jnp.asarray(gt_labels, jnp.int32),
                     jnp.asarray(gt_boxes), jnp.ones(g, bool),
                     jnp.asarray([w, h, w, h], jnp.float32))
    our_fg = np.asarray(m.fg)
    our_gt = np.asarray(m.matched_gt)

    np.testing.assert_array_equal(our_fg, ref_fg)
    np.testing.assert_array_equal(our_gt[our_fg], ref_gt)


def test_simota_matcher_empty_gt_matches_reference():
    from diffusionvid_tpu.models.criterion import simota_match
    rng = np.random.RandomState(7)
    n, k, w, h = 32, 30, 640.0, 480.0
    logits = rng.randn(n, k).astype(np.float32)
    boxes = _rand_boxes(rng, n, w, h)

    outputs = {"pred_logits": torch.as_tensor(logits).unsqueeze(0),
               "pred_boxes": torch.as_tensor(boxes).unsqueeze(0)}
    targets = [_targets_ref(np.zeros((0, 4), np.float32),
                            np.zeros((0,), np.int64), w, h)]
    (indices, _) = _ref_matcher()(outputs, targets)
    assert indices[0][0].numpy().sum() == 0

    # ours pads with gt_valid=False instead of a ragged empty list
    m = simota_match(jnp.asarray(logits), jnp.asarray(boxes),
                     jnp.ones(4, jnp.int32), jnp.zeros((4, 4)),
                     jnp.zeros(4, bool), jnp.asarray([w, h, w, h]))
    assert np.asarray(m.fg).sum() == 0


# ------------------------------------------------------------- criterion

def test_criterion_losses_match_reference():
    """SetCriterionDynamicK's loss_ce / loss_bbox / loss_giou on a 2-image
    batch with different GT counts (our side pads with gt_valid)."""
    from diffusionvid_tpu.models.criterion import criterion_losses

    rng = np.random.RandomState(11)
    b, n, k = 2, 96, 30
    w, h = 512.0, 384.0
    gmax = 5
    gs = [3, 5]
    logits = rng.randn(b, n, k).astype(np.float32)
    boxes = np.stack([_rand_boxes(rng, n, w, h) for _ in range(b)])
    gt_boxes = np.zeros((b, gmax, 4), np.float32)
    gt_labels = np.ones((b, gmax), np.int64)
    gt_valid = np.zeros((b, gmax), bool)
    targets = []
    for i, gi in enumerate(gs):
        gb = _rand_boxes(rng, gi, w, h)
        gl = rng.randint(1, k + 1, gi)
        gt_boxes[i, :gi] = gb
        gt_labels[i, :gi] = gl
        gt_valid[i, :gi] = True
        targets.append(_targets_ref(gb, gl, w, h))

    criterion = REF.loss.SetCriterionDynamicK(
        _ref_cfg(), num_classes=k, matcher=_ref_matcher(),
        weight_dict={"loss_ce": 2.0, "loss_bbox": 5.0, "loss_giou": 2.0},
        eos_coef=0.1, losses=["labels", "boxes"], use_focal=True)
    outputs = {"pred_logits": torch.as_tensor(logits),
               "pred_boxes": torch.as_tensor(boxes)}
    ref_losses = criterion(outputs, targets)

    ours = criterion_losses(
        jnp.asarray(logits), jnp.asarray(boxes),
        jnp.asarray(gt_labels, jnp.int32), jnp.asarray(gt_boxes),
        jnp.asarray(gt_valid),
        jnp.tile(jnp.asarray([w, h, w, h], jnp.float32), (b, 1)),
        num_classes=k)

    for name in ("loss_ce", "loss_bbox", "loss_giou"):
        np.testing.assert_allclose(float(ours[name]),
                                   float(ref_losses[name]),
                                   rtol=2e-4,
                                   err_msg=name)


# ------------------------------------------------------------- box coder

def test_box_coder_matches_reference():
    """mega_core/modeling/box_coder.py encode/decode round trip."""
    from diffusionvid_tpu.structures.boxes import encode_boxes, decode_boxes

    rng = np.random.RandomState(3)
    n, w, h = 40, 800.0, 600.0
    ref_boxes = _rand_boxes(rng, n, w, h)
    proposals = ref_boxes + rng.uniform(-12, 12, (n, 4)).astype(np.float32)
    proposals[:, 2:] = np.maximum(proposals[:, 2:], proposals[:, :2] + 1.0)

    coder = REF.box_coder.BoxCoder(weights=(10.0, 10.0, 5.0, 5.0))
    ref_deltas = coder.encode(torch.as_tensor(ref_boxes),
                              torch.as_tensor(proposals)).numpy()
    ours_deltas = np.asarray(encode_boxes(jnp.asarray(ref_boxes),
                                          jnp.asarray(proposals)))
    np.testing.assert_allclose(ours_deltas, ref_deltas, rtol=1e-4, atol=1e-4)

    ref_decoded = coder.decode(torch.as_tensor(ref_deltas),
                               torch.as_tensor(proposals)).numpy()
    ours_decoded = np.asarray(decode_boxes(jnp.asarray(ref_deltas),
                                           jnp.asarray(proposals)))
    np.testing.assert_allclose(ours_decoded.reshape(ref_decoded.shape),
                               ref_decoded, rtol=1e-4, atol=1e-3)


# --------------------------------------------------------------- seq-NMS

def _ref_seq_nms_one_class(boxes_frames, scores_frames, img_size):
    """Run the reference seq_nms on a single-class video; other 29 class
    rows are empty BoxLists (createLinks iterates len(CLASSES)-1 rows)."""
    BoxList = REF.bounding_box.BoxList
    ncls = len(REF.seq_nms.CLASSES) - 1

    def bl(b, s):
        # the reference mutates BoxList tensors in place (rescore /
        # deleteLink zero_()), so COPY — torch.as_tensor would alias the
        # caller's numpy arrays
        x = BoxList(torch.tensor(np.asarray(b, np.float32)).reshape(-1, 4),
                    img_size)
        x.add_field("scores", torch.tensor(np.asarray(s, np.float32)))
        return x

    dets = [[bl(b, s) for b, s in zip(boxes_frames, scores_frames)]]
    empty = [[bl(np.zeros((0, 4)), np.zeros(0)) for _ in boxes_frames]
             for _ in range(ncls - 1)]
    out = REF.seq_nms.seq_nms(dets + empty)
    result = []
    for fr in out[0]:
        result.append((fr.bbox.numpy(), fr.get_field("scores").numpy()))
    return result


def test_seq_nms_matches_reference():
    """Same detections through /root/reference/seq_nms.py and our dead-mask
    DP: identical surviving (box, score) sets per frame."""
    from diffusionvid_tpu.engine.seq_nms import seq_nms_class

    rng = np.random.RandomState(5)
    w, h = 320.0, 240.0
    frames_boxes, frames_scores = [], []
    # two drifting tracks + clutter, scores descending within a frame
    base = np.array([[40.0, 40.0, 110.0, 120.0], [180.0, 60.0, 260.0, 150.0]])
    for f in range(6):
        tracks = base + f * np.array([[3.0, 2.0, 3.0, 2.0],
                                      [-2.0, 1.0, -2.0, 1.0]])
        clutter = _rand_boxes(rng, 4, w, h, min_side=20, max_side=90)
        b = np.concatenate([tracks, clutter]).astype(np.float32)
        s = np.concatenate([rng.uniform(0.7, 0.95, 2),
                            rng.uniform(0.05, 0.5, 4)]).astype(np.float32)
        order = np.argsort(-s)
        frames_boxes.append(b[order])
        frames_scores.append(s[order])

    ref_out = _ref_seq_nms_one_class(frames_boxes, frames_scores,
                                     (int(w), int(h)))
    keep, new_scores = seq_nms_class(frames_boxes, frames_scores)

    for f in range(len(frames_boxes)):
        ref_set = {(tuple(np.round(b, 3)), round(float(s), 4))
                   for b, s in zip(*ref_out[f])}
        our_set = {(tuple(np.round(frames_boxes[f][i], 3)),
                    round(float(new_scores[f][i]), 4))
                   for i in np.nonzero(keep[f])[0]}
        assert our_set == ref_set, f"frame {f}"


# ------------------------------------------------------------- VID eval

def _to_boxlists(gt_list, pred_list, img_size):
    BoxList = REF.bounding_box.BoxList
    gts, preds = [], []
    for g in gt_list:
        x = BoxList(torch.as_tensor(g["boxes"], dtype=torch.float32)
                    .reshape(-1, 4), img_size)
        x.add_field("labels", torch.as_tensor(g["labels"],
                                              dtype=torch.int64))
        gts.append(x)
    for p in pred_list:
        x = BoxList(torch.as_tensor(p["boxes"], dtype=torch.float32)
                    .reshape(-1, 4), img_size)
        x.add_field("labels", torch.as_tensor(p["labels"],
                                              dtype=torch.int64))
        x.add_field("scores", torch.as_tensor(p["scores"],
                                              dtype=torch.float32))
        x.add_field("objectness", torch.as_tensor(p["scores"],
                                                  dtype=torch.float32))
        preds.append(x)
    return gts, preds


def _rand_eval_case(seed, frames=12, ncls=6):
    rng = np.random.RandomState(seed)
    w, h = 400.0, 300.0
    gt_list, pred_list = [], []
    for _ in range(frames):
        g = rng.randint(0, 5)
        gb = _rand_boxes(rng, g, w, h, min_side=16, max_side=100)
        gl = rng.randint(1, ncls + 1, g)
        gt_list.append({"boxes": gb, "labels": gl})
        # predictions: jittered copies of GT + noise boxes
        pb, pl, ps = [], [], []
        for i in range(g):
            if rng.rand() < 0.8:
                jit = gb[i] + rng.uniform(-10, 10, 4)
                jit[2:] = np.maximum(jit[2:], jit[:2] + 4)
                pb.append(jit)
                pl.append(gl[i] if rng.rand() < 0.8
                          else rng.randint(1, ncls + 1))
                ps.append(rng.uniform(0.3, 0.99))
        m = rng.randint(0, 4)
        for b in _rand_boxes(rng, m, w, h, min_side=12, max_side=80):
            pb.append(b)
            pl.append(rng.randint(1, ncls + 1))
            ps.append(rng.uniform(0.01, 0.6))
        pred_list.append({
            "boxes": np.asarray(pb, np.float32).reshape(-1, 4),
            "labels": np.asarray(pl, np.int64).reshape(-1),
            "scores": np.asarray(ps, np.float32).reshape(-1)})
    return gt_list, pred_list, (int(w), int(h))


@pytest.mark.parametrize("seed", [0, 1])
def test_vid_eval_ap_matches_reference(seed):
    """AP50 per class from vid_eval.py:134-354 vs our evaluator on random
    detections (no motion buckets — no .mat here)."""
    from diffusionvid_tpu.evaluation.vid_eval import evaluate_vid

    gt_list, pred_list, size = _rand_eval_case(seed)
    gts, preds = _to_boxlists(gt_list, pred_list, size)

    ref = REF.vid_eval.eval_detection_vid(
        pred_boxlists=preds, gt_boxlists=gts, iou_thresh=0.5,
        motion_ranges=[[0.0, 1.0]], motion_specific=False,
        use_07_metric=False)
    ref_ap = np.asarray(ref[0]["ap"], np.float64)

    ours = evaluate_vid(gt_list, pred_list, num_classes=6)
    our_ap = np.asarray(ours["ap"], np.float64)

    # reference ap is indexed by class id incl. background slot 0 (nan)
    n = min(len(ref_ap), len(our_ap))
    np.testing.assert_allclose(our_ap[1:n], ref_ap[1:n], rtol=1e-6,
                               atol=1e-9, equal_nan=True)
    assert abs(float(np.nanmean(our_ap[1:n])) -
               float(np.nanmean(ref_ap[1:n]))) < 1e-9


@pytest.mark.parametrize("seed", [0, 3])
def test_proposal_recall_matches_reference(seed):
    """eval_proposals_vid (vid_eval.py:85-130) vs our box_only recall."""
    from diffusionvid_tpu.evaluation.vid_eval import eval_proposals

    gt_list, pred_list, size = _rand_eval_case(seed, frames=10)
    gts, preds = _to_boxlists(gt_list, pred_list, size)

    ref = REF.vid_eval.eval_proposals_vid(pred_boxlists=preds,
                                          gt_boxlists=gts, iou_thresh=0.5)
    ours = eval_proposals(gt_list, pred_list, iou_thresh=0.5)
    np.testing.assert_allclose(ours["recall"], float(ref["recall"]),
                               rtol=1e-6)
