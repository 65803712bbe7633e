"""box_only proposal-recall unit tests (hand-computed cases)."""

import numpy as np

def test_eval_proposals_hand_case():
    """box_only recall on a hand-computed case: 3 GTs, one matched by a
    high-objectness proposal, one matched only by a low-objectness one,
    one missed entirely -> recall 2/3.  Greedy matching retires both the
    proposal and the GT each round (vid_eval.py:104-121)."""
    from diffusionvid_tpu.evaluation.vid_eval import eval_proposals
    gt = [{"boxes": np.array([[0, 0, 10, 10],
                              [50, 50, 80, 80],
                              [200, 200, 230, 230]], np.float32),
           "labels": np.array([1, 2, 3])}]
    pred = [{"boxes": np.array([[0, 0, 10, 10],      # exact hit GT0
                                [49, 51, 79, 81],    # near hit GT1
                                [120, 0, 140, 20]],  # miss
                               np.float32),
             "labels": np.array([1, 2, 1]),
             "scores": np.array([0.9, 0.2, 0.8], np.float32)}]
    out = eval_proposals(gt, pred, iou_thresh=0.5)
    assert abs(out["recall"] - 2.0 / 3.0) < 1e-9


def test_eval_proposals_limit_and_objectness_order():
    """The cap applies AFTER objectness ordering: with limit=1 only the
    top-objectness proposal participates."""
    from diffusionvid_tpu.evaluation.vid_eval import eval_proposals
    gt = [{"boxes": np.array([[0, 0, 10, 10]], np.float32),
           "labels": np.array([1])}]
    pred = [{"boxes": np.array([[100, 100, 120, 120],
                                [0, 0, 10, 10]], np.float32),
             "labels": np.array([1, 1]),
             "scores": np.array([0.1, 0.2], np.float32),
             "objectness": np.array([0.9, 0.5], np.float32)}]
    # top-objectness box misses the GT -> recall 0 with limit=1
    assert eval_proposals(gt, pred, limit=1)["recall"] == 0.0
    # with both allowed the exact-hit box matches -> recall 1
    assert eval_proposals(gt, pred, limit=300)["recall"] == 1.0
