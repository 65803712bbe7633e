"""Dataset-level inference: stream every video, collect + save predictions,
evaluate.

Replaces the reference inference engine (``mega_core/engine/inference.py``):
the sequential per-frame stateful loop becomes per-video chunked streaming;
multi-process result merge keeps the reference's video-boundary sharding
(each shard owns whole videos, samplers/distributed.py:69-115).  Saved
predictions (``predictions.pkl``, the reference's ``predictions.pth``
analogue, inference.py:165-168) can be re-evaluated without a model
(``inference_no_model``, inference.py:184-209).
"""

from __future__ import annotations

import os
import pickle
import time
from typing import Optional

import jax
import numpy as np

from ..data.prefetch import PrefetchIterator
from ..data.sampling import SampleConfig, iter_test_videos
from ..data.vid_dataset import VIDDataset
from ..evaluation.vid_eval import evaluate_vid
from .seq_nms import seq_nms_video
from .streaming import StreamingDetector


def _detections_to_numpy(dets, i, scale, score_thresh: float = 0.0):
    """BoxArray row i → numpy dict in ORIGINAL image coordinates."""
    valid = np.asarray(dets.valid[i])
    scores = np.asarray(dets.scores[i])
    keep = valid & (scores > score_thresh)
    return {
        "boxes": np.asarray(dets.boxes[i])[keep] / scale,
        "scores": scores[keep],
        "labels": np.asarray(dets.labels[i])[keep],
    }


def save_predictions(output_dir, predictions, tagged, shard, num_shards):
    """Single shard: flat ``predictions.pkl`` (the reference's
    predictions.pth, inference.py:165-168).  Sharded: a tagged
    ``predictions_shard{K}of{N}.pkl`` that tools/test_net.py merges back
    into global frame order."""
    if num_shards > 1:
        path = os.path.join(output_dir,
                            f"predictions_shard{shard}of{num_shards}.pkl")
        with open(path, "wb") as f:
            pickle.dump(tagged, f)
    else:
        with open(os.path.join(output_dir, "predictions.pkl"), "wb") as f:
            pickle.dump(predictions, f)


def run_inference(model, params, dataset: VIDDataset, sample_cfg: SampleConfig,
                  *, sample_step: int = 1, mem_size: int = 900,
                  num_proposals: int = 300, output_dir: Optional[str] = None,
                  use_seq_nms: bool = False, motion_ious=None,
                  motion_specific: bool = False, seed: int = 0,
                  shard: int = 0, num_shards: int = 1, logger=None,
                  max_videos: Optional[int] = None,
                  stop_update_after_init: bool = True):
    """Run the flagship streaming detector over a test dataset.

    Returns (predictions, gt_list, results_dict_or_None).
    """
    det = StreamingDetector(model, params, infer_batch=sample_cfg.infer_batch,
                            sample_step=sample_step, mem_size=mem_size,
                            num_proposals=num_proposals,
                            stop_update_after_init=stop_update_after_init)
    if motion_ious is not None and (num_shards > 1 or max_videos is not None):
        motion_ious = None   # .mat rows align to the FULL dataset only;
        # sharded runs get motion buckets from the merged eval in test_net
    predictions = []
    tagged = []          # [(video_index, [frame dicts…]), …] for shard merge
    gt_list = []
    rng = jax.random.PRNGKey(seed)
    n_frames = 0
    t0 = time.perf_counter()

    # prefetch: next video's init frames decode while this one streams, and
    # each video's chunks decode a step ahead of the device (the reference
    # hides host IO behind 16 dataloader workers, DATALOADER.NUM_WORKERS)
    videos = PrefetchIterator(
        iter_test_videos(dataset, sample_cfg, seed=seed, shard=shard,
                         num_shards=num_shards), depth=1)
    for n_vid, video in enumerate(videos):
        if max_videos is not None and n_vid >= max_videos:
            videos.close()   # release the producer thread + its buffers
            break
        rng, r_video = jax.random.split(rng)
        whwh = video.whwh
        orig_w = video.frame_annos[0].width
        scale = float(whwh[0]) / float(orig_w)

        state = det.start_video(r_video, video.global_frames, whwh)
        video_preds = []
        # 1-deep pipeline: jax dispatch is async, so convert chunk N's
        # detections (host D2H + numpy) while the device runs chunk N+1
        pending = None
        for frames, ids, n_valid in PrefetchIterator(video.chunk_iter,
                                                     depth=2):
            state, dets = det.process_chunk(state, frames, whwh, n_valid)
            if pending is not None:
                p_dets, p_valid = pending
                for i in range(p_valid):
                    video_preds.append(_detections_to_numpy(p_dets, i, scale))
            pending = (dets, n_valid)
            n_frames += n_valid
        if pending is not None:
            p_dets, p_valid = pending
            for i in range(p_valid):
                video_preds.append(_detections_to_numpy(p_dets, i, scale))

        if use_seq_nms:
            video_preds = seq_nms_video(video_preds)

        predictions.extend(video_preds)
        tagged.append((video.video_index, video_preds))
        for anno in video.frame_annos:
            gt_list.append({"boxes": anno.boxes, "labels": anno.labels})
        if logger:
            fps = n_frames / max(time.perf_counter() - t0, 1e-9)
            logger.info(f"video {n_vid}: {video.seg_len} frames "
                        f"({fps:.1f} fps cumulative)")

    if jax.process_count() > 1:
        # multi-host pod run: exchange tagged per-video predictions over
        # the mesh and rebuild global frame order (the reference's pickle
        # all_gather merge, engine/inference.py:97-116)
        from ..parallel.multihost import gather_predictions
        merged = gather_predictions(tagged)
        if merged is not None and merged is not tagged:
            predictions = merged
            gt_list = [{"boxes": a.boxes, "labels": a.labels}
                       for a in dataset.annos]

    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        save_predictions(output_dir, predictions, tagged, shard, num_shards)

    results = None
    if gt_list:
        results = evaluate_vid(gt_list, predictions, motion_ious=motion_ious,
                               motion_specific=motion_specific)
        if logger:
            logger.info(f"AP50: {results['ap50']:.4f}  "
                        f"per-motion: {results['per_motion']}")
        if output_dir:
            with open(os.path.join(output_dir, "result.txt"), "w") as f:
                f.write(f"AP50 = {results['ap50']:.4f}\n")
                for k, v in results["per_motion"].items():
                    f.write(f"AP50 | motion={k:>6s} = {v:.4f}\n")
    return predictions, gt_list, results


def inference_no_model(predictions_path: str, dataset: VIDDataset,
                       motion_ious=None, motion_specific: bool = False):
    """Re-evaluate saved predictions (tools/test_prediction.py flow)."""
    with open(predictions_path, "rb") as f:
        predictions = pickle.load(f)
    gt_list = [{"boxes": a.boxes, "labels": a.labels} for a in dataset.annos]
    assert len(gt_list) == len(predictions), \
        f"{len(gt_list)} GT frames vs {len(predictions)} predictions"
    return evaluate_vid(gt_list, predictions, motion_ious=motion_ious,
                        motion_specific=motion_specific)
