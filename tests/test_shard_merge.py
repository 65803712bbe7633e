"""Cross-shard prediction merge (tools/test_net.merge_shard_predictions):
tagged per-shard files reassemble the dataset's global frame order
(reference engine/inference.py:97-116 pickle all_gather merge)."""

import os
import pickle
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from test_net import merge_shard_predictions  # noqa: E402


def _frame(v, f):
    return {"video": v, "frame": f}


def test_merge_reassembles_global_order(tmp_path):
    # 5 videos dealt round-robin over 2 shards: shard0 = videos 0,2,4;
    # shard1 = videos 1,3 (iter_test_videos vi % num_shards semantics)
    shard0 = [(0, [_frame(0, 0), _frame(0, 1)]),
              (2, [_frame(2, 0)]),
              (4, [_frame(4, 0), _frame(4, 1), _frame(4, 2)])]
    shard1 = [(1, [_frame(1, 0)]),
              (3, [_frame(3, 0), _frame(3, 1)])]
    with open(tmp_path / "predictions_shard0of2.pkl", "wb") as f:
        pickle.dump(shard0, f)
    with open(tmp_path / "predictions_shard1of2.pkl", "wb") as f:
        pickle.dump(shard1, f)

    merged = merge_shard_predictions(str(tmp_path), 2)
    order = [(p["video"], p["frame"]) for p in merged]
    assert order == [(0, 0), (0, 1), (1, 0), (2, 0), (3, 0), (3, 1),
                     (4, 0), (4, 1), (4, 2)]
    # merged flat file written for inference_no_model re-eval
    with open(tmp_path / "predictions.pkl", "rb") as f:
        assert len(pickle.load(f)) == 9


def test_merge_waits_for_missing_shards(tmp_path):
    with open(tmp_path / "predictions_shard0of3.pkl", "wb") as f:
        pickle.dump([(0, [_frame(0, 0)])], f)
    assert merge_shard_predictions(str(tmp_path), 3) is None
    assert not os.path.exists(tmp_path / "predictions.pkl")


def test_merge_single_video_per_shard(tmp_path):
    for k in range(3):
        with open(tmp_path / f"predictions_shard{k}of3.pkl", "wb") as f:
            pickle.dump([(k, [_frame(k, 0)])], f)
    merged = merge_shard_predictions(str(tmp_path), 3)
    assert [p["video"] for p in merged] == [0, 1, 2]
