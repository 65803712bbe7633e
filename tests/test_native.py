"""Native vidkit library vs Python reference implementations."""

import numpy as np
import pytest

from diffusionvid_tpu.native import get_lib, match_frame_native, max_chain_native


pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native toolchain unavailable")


def _python_match(pb, gb, gi, thresh, empty_weight):
    """The evaluator's Python loop, extracted for comparison."""
    from diffusionvid_tpu.evaluation.vid_eval import _iou_matrix_plus2
    if len(gb) == 0:
        return [0] * len(pb), [empty_weight] * len(pb)
    iou = _iou_matrix_plus2(pb, gb)
    taken = np.zeros(len(gb), bool)
    match, pig = [], []
    for j in range(len(pb)):
        best, best_ig, best_nig, arg = thresh, -1.0, -1.0, -1
        for k in range(len(gb)):
            v = iou[j, k]
            if gi[k] == 1 and v > best_ig:
                best_ig = v
            if gi[k] == 0 and v > best_nig:
                best_nig = v
            if taken[k] or v < best:
                continue
            if v == best:
                if arg < 0 or gi[arg]:
                    arg = k
            else:
                arg = k
            best = v
        if arg >= 0:
            match.append(1)
            pig.append(gi[arg])
            taken[arg] = True
        else:
            match.append(0)
            if best_nig > best_ig:
                pig.append(0.0)
            elif best_ig > best_nig:
                pig.append(1.0)
            else:
                pig.append(gi.sum() / float(len(gb)))
    return match, pig


def test_match_frame_random_agreement():
    rng = np.random.RandomState(0)
    for trial in range(30):
        n, g = rng.randint(1, 40), rng.randint(0, 6)
        pb = rng.uniform(0, 200, (n, 4))
        pb[:, 2:] = pb[:, :2] + rng.uniform(5, 80, (n, 2))
        gb = rng.uniform(0, 200, (g, 4))
        if g:
            gb[:, 2:] = gb[:, :2] + rng.uniform(5, 80, (g, 2))
        gi = rng.randint(0, 2, g).astype(np.float64)
        ew = float(rng.rand())
        m_n, p_n = match_frame_native(pb, gb, gi, 0.5, ew)
        m_p, p_p = _python_match(pb, gb, gi, 0.5, ew)
        np.testing.assert_array_equal(m_n, m_p, err_msg=f"trial {trial}")
        np.testing.assert_allclose(p_n, p_p, atol=1e-12,
                                   err_msg=f"trial {trial}")


def test_max_chain_simple():
    # 3 frames, one stable box each + a decoy in frame 1
    box = [10, 10, 50, 50]
    decoy = [200, 200, 240, 240]
    boxes = np.asarray([box, box, decoy, box], np.float64)
    scores = np.asarray([0.9, 0.1, 0.95, 0.8])
    dead = np.zeros(4, np.uint8)
    offsets = np.asarray([0, 1, 3, 4], np.int32)
    root, path, total = max_chain_native(boxes, scores, dead, offsets, 0.5)
    assert root == 0
    assert path == [0, 1, 3]
    assert total == pytest.approx(0.9 + 0.1 + 0.8)

    # kill the chain head → best is the decoy alone
    dead[0] = 1
    root2, path2, total2 = max_chain_native(boxes, scores, dead, offsets, 0.5)
    assert total2 == pytest.approx(0.95)
    assert path2 == [2]


def test_evaluator_uses_native_and_matches():
    """End-to-end evaluator result identical with/without native path."""
    from diffusionvid_tpu.evaluation import evaluate_vid
    import diffusionvid_tpu.native as native

    rng = np.random.RandomState(3)
    gt, preds = [], []
    for _ in range(8):
        g = rng.randint(1, 4)
        gb = rng.uniform(0, 150, (g, 4))
        gb[:, 2:] = gb[:, :2] + rng.uniform(10, 60, (g, 2))
        gl = rng.randint(1, 5, g)
        gt.append({"boxes": gb.astype(np.float32), "labels": gl})
        n = rng.randint(1, 10)
        pb = rng.uniform(0, 150, (n, 4))
        pb[:, 2:] = pb[:, :2] + rng.uniform(10, 60, (n, 2))
        pb[0] = gb[0]
        pl = rng.randint(1, 5, n)
        pl[0] = gl[0]
        preds.append({"boxes": pb.astype(np.float32),
                      "scores": rng.rand(n).astype(np.float32),
                      "labels": pl})
    with_native = evaluate_vid(gt, preds)

    saved = native._lib, native._tried
    native._lib, native._tried = None, True     # force fallback
    try:
        without = evaluate_vid(gt, preds)
    finally:
        native._lib, native._tried = saved
    assert with_native["ap50"] == pytest.approx(without["ap50"], abs=1e-12)
