#!/usr/bin/env python
"""Evaluate a trained model on a VID dataset.

TPU-native equivalent of the reference ``tools/test_net.py:29-138``:
config-driven model build via the meta-architecture dispatcher
(``detectors.py:11-22``), checkpoint load, per-video streaming inference
sharded at video boundaries, predictions.pkl output, AP50(+motion) report.

Usage:
    python tools/test_net.py --config-file configs/vid_R_101_DiffusionVID.yaml \
        --checkpoint OUTPUT/model_0001000 [MODEL.DiffusionDet.SAMPLE_STEP 4]
"""

import argparse
import glob
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def merge_shard_predictions(output_dir: str, num_shards: int):
    """Merge per-shard tagged prediction files into global frame order.

    Each ``predictions_shard{K}of{N}.pkl`` holds [(video_index, [frame
    dicts…]), …]; videos were dealt round-robin (video v → shard v % N,
    sampling.iter_test_videos), so sorting by video index rebuilds the
    dataset's frame order (the reference's pickle all_gather merge,
    engine/inference.py:97-116).  Returns the flat list or None if shards
    are still missing."""
    paths = [os.path.join(output_dir, f"predictions_shard{k}of{num_shards}.pkl")
             for k in range(num_shards)]
    if not all(os.path.exists(p) for p in paths):
        return None
    tagged = []
    for p in paths:
        with open(p, "rb") as f:
            tagged.extend(pickle.load(f))
    tagged.sort(key=lambda t: t[0])
    merged = []
    for _, preds in tagged:
        merged.extend(preds)
    with open(os.path.join(output_dir, "predictions.pkl"), "wb") as f:
        pickle.dump(merged, f)
    return merged


def load_motion_ious(path, logger):
    if not path or not os.path.exists(path):
        if logger:
            logger.warning(
                f"--motion-specific requested but motion-IoU file not found "
                f"({path}); reporting the 'all' bucket only")
        return None
    from diffusionvid_tpu.evaluation.vid_eval import load_motion_iou_mat
    return load_motion_iou_mat(path)


def main():
    parser = argparse.ArgumentParser(description="DiffusionVID-TPU inference")
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--torch-weights", default=None,
                        help="convert + load a reference .pth/.pkl checkpoint")
    parser.add_argument("--data-dir", default=None)
    parser.add_argument("--output-dir", default=None)
    parser.add_argument("--motion-specific", action="store_true")
    parser.add_argument("--motion-iou-file", default=None,
                        help="path to vid_groundtruth_motion_iou.mat "
                             "(reference vid_eval.py:144)")
    parser.add_argument("--seq-nms", action="store_true")
    parser.add_argument("--box-only", action="store_true",
                        help="proposal-recall evaluation instead of AP "
                             "(reference MODEL.RPN_ONLY / vid_eval.py:26)")
    parser.add_argument("--profile-dir", default=None,
                        help="write a jax.profiler trace of the run")
    parser.add_argument("--max-videos", type=int, default=None)
    parser.add_argument("--shard", type=int, default=0)
    parser.add_argument("--num-shards", type=int, default=1)
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from diffusionvid_tpu.config import load_config
    from diffusionvid_tpu.data import get_dataset, SampleConfig
    from diffusionvid_tpu.engine.inference import run_inference
    from diffusionvid_tpu.engine.inference_mega import run_inference_video_arch
    from diffusionvid_tpu.evaluation.vid_eval import evaluate_vid
    from diffusionvid_tpu.models.detectors import build_detection_model
    from diffusionvid_tpu.utils import (
        setup_logger, load_checkpoint, load_torch_checkpoint, merge_pretrained)

    cfg = load_config(args.config_file, args.opts)
    output_dir = args.output_dir or os.path.join(cfg.OUTPUT_DIR, "inference")
    logger = setup_logger(save_dir=output_dir)

    method = cfg.MODEL.VID.METHOD if cfg.MODEL.VID.ENABLE else "base"
    is_diffusion = (method == "diffusion"
                    or cfg.MODEL.META_ARCHITECTURE == "DiffusionDet")
    model = build_detection_model(cfg)
    dataset_name = cfg.DATASETS.TEST[0]
    ds = get_dataset(dataset_name, is_train=False, data_dir=args.data_dir)
    mega = cfg.MODEL.VID.MEGA
    sample_cfg = SampleConfig(
        num_global=mega.REF_NUM_GLOBAL,
        min_size=cfg.INPUT.MIN_SIZE_TEST, max_size=cfg.INPUT.MAX_SIZE_TEST,
        global_size=mega.GLOBAL.SIZE, infer_batch=cfg.INPUT.INFER_BATCH,
        shuffle_global=mega.GLOBAL.SHUFFLE)

    motion_ious = None
    if args.motion_specific:
        mat = args.motion_iou_file
        if mat is None and args.data_dir:
            mat = os.path.join(args.data_dir,
                               "vid_groundtruth_motion_iou.mat")
        motion_ious = load_motion_ious(mat, logger)

    # init params (shape-independent), then overwrite from checkpoint
    h, w = 64, 96
    if is_diffusion:
        from diffusionvid_tpu.models.diffusion_det import signal_to_boxes
        f = cfg.INPUT.INFER_BATCH
        whwh = jnp.asarray([w, h, w, h], jnp.float32)
        boxes = signal_to_boxes(
            jax.random.normal(jax.random.PRNGKey(0),
                              (f, model.num_proposals, 4)),
            whwh, 2.0)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "cfg": jax.random.PRNGKey(1)},
            jnp.zeros((f, h, w, 3)), boxes, jnp.zeros((f,), jnp.int32),
            num_global=1, train=False)
    else:
        cur = jnp.zeros((1, h, w, 3))
        refs = jnp.zeros((2, h, w, 3))
        if method == "base":
            variables = model.init(jax.random.PRNGKey(0), cur, (h, w))
        elif method == "dff":
            variables = model.init(jax.random.PRNGKey(0), cur, cur, (h, w),
                                   is_key=False)
        elif method == "fgfa":
            variables = model.init(jax.random.PRNGKey(0), cur, refs, (h, w))
        elif method == "rdn":
            variables = model.init(jax.random.PRNGKey(0), cur, refs, (h, w))
        elif method == "mega":
            variables = model.init(jax.random.PRNGKey(0), cur, refs, (h, w),
                                   state=model.init_state())
        elif method == "dafa":
            whwh = jnp.asarray([w, h, w, h], jnp.float32)
            variables = model.init(jax.random.PRNGKey(0), cur, whwh,
                                   state=model.init_state())
        else:
            raise ValueError(f"unknown VID.METHOD {method}")

    if args.checkpoint:
        loaded = load_checkpoint(args.checkpoint)
        variables = {"params": loaded["params"]}
        logger.info(f"loaded checkpoint {args.checkpoint}")
    elif args.torch_weights:
        conv = load_torch_checkpoint(args.torch_weights)
        merged, n = merge_pretrained(variables["params"], conv["params"],
                                     skip_keys=())
        variables = {"params": merged}
        logger.info(f"converted torch weights: {n} tensors copied")

    if not getattr(ds, "is_video", True):
        # still-image dataset (coco_*/voc_*/cityscapes_*): per-image eval
        # with the single-frame detector + the matching evaluator
        from diffusionvid_tpu.engine.inference_still import run_inference_still
        ev = ("coco" if dataset_name.startswith("coco_")
              else "cityscapes" if dataset_name.startswith("cityscapes_")
              else "voc")
        if is_diffusion or method not in ("base",):
            raise SystemExit(
                f"still-image dataset {dataset_name} needs a single-frame "
                f"detector (VID.METHOD base / META_ARCHITECTURE "
                f"GeneralizedRCNN); got method={method}")
        _, _, results = run_inference_still(
            model, variables, ds, min_size=cfg.INPUT.MIN_SIZE_TEST,
            max_size=cfg.INPUT.MAX_SIZE_TEST, logger=logger,
            max_images=args.max_videos, evaluator=ev)
        logger.info(f"FINAL AP50 = {results['ap50']:.4f}")
        return

    from diffusionvid_tpu.utils.profiling import trace
    with trace(args.profile_dir):
        if is_diffusion:
            predictions, gt_list, results = run_inference(
                model, variables, ds, sample_cfg,
                sample_step=cfg.MODEL.DiffusionDet.SAMPLE_STEP,
                mem_size=mega.MEMORY_MANAGEMENT_SIZE_TEST,
                num_proposals=cfg.MODEL.DiffusionDet.NUM_PROPOSALS,
                output_dir=output_dir, use_seq_nms=args.seq_nms,
                motion_ious=motion_ious,
                motion_specific=args.motion_specific, logger=logger,
                shard=args.shard, num_shards=args.num_shards,
                max_videos=args.max_videos,
                stop_update_after_init=mega.GLOBAL.STOP_UPDATE_AFTER_INIT_TEST)
        else:
            predictions, gt_list, results = run_inference_video_arch(
                model, variables, ds, sample_cfg, method=method,
                key_frame_duration=cfg.MODEL.VID.DFF.KEY_FRAME_DURATION,
                logger=logger, max_videos=args.max_videos,
                output_dir=output_dir, use_seq_nms=args.seq_nms,
                motion_ious=motion_ious, motion_specific=args.motion_specific,
                shard=args.shard, num_shards=args.num_shards,
                use_bbox_aug=bool(cfg.TEST.BBOX_AUG.ENABLED),
                bbox_aug_h_flip=bool(cfg.TEST.BBOX_AUG.H_FLIP),
                bbox_aug_scales=tuple(cfg.TEST.BBOX_AUG.SCALES),
                bbox_aug_max_size=int(cfg.TEST.BBOX_AUG.MAX_SIZE),
                bbox_aug_scale_h_flip=bool(cfg.TEST.BBOX_AUG.SCALE_H_FLIP),
                shuffled_cur=bool(cfg.MODEL.VID.MEGA.SHUFFLED_CUR_TEST),
                all_frame_interval=int(cfg.MODEL.VID.MEGA.ALL_FRAME_INTERVAL),
                key_frame_location=int(cfg.MODEL.VID.MEGA.KEY_FRAME_LOCATION))

    if args.box_only or cfg.MODEL.RPN_ONLY:
        # proposal-recall mode (reference vid_eval.py:26-37, 85-130):
        # class-agnostic recall over score-ordered proposals, written to
        # proposal_result.txt instead of the AP pipeline
        from diffusionvid_tpu.evaluation.vid_eval import eval_proposals
        rec = eval_proposals(gt_list, predictions)["recall"]
        line = f"Recall: {rec:.4f}"
        logger.info(line)
        if output_dir:
            with open(os.path.join(output_dir, "proposal_result.txt"),
                      "w") as fid:
                fid.write(line)
        return

    if args.num_shards > 1:
        # cross-shard merge: evaluate only once all shards have written
        merged = merge_shard_predictions(output_dir, args.num_shards)
        if merged is None:
            logger.info(f"shard {args.shard}/{args.num_shards} done; "
                        f"waiting on other shards for the merged eval")
            return
        gt_all = [{"boxes": a.boxes, "labels": a.labels} for a in ds.annos]
        # the VID_val_* index files list one line per FRAME (vid.py:56-66),
        # so ds.annos aligns with the merged per-frame predictions; a
        # mismatch means partial coverage (--max-videos, or an index whose
        # granularity differs) — skip the merged eval rather than crash
        # after all shards finished their inference
        if len(gt_all) != len(merged):
            logger.warning(
                f"merged eval skipped: {len(gt_all)} GT entries vs "
                f"{len(merged)} merged predictions (partial shards / "
                f"--max-videos?)")
            return
        results = evaluate_vid(gt_all, merged, motion_ious=motion_ious,
                               motion_specific=args.motion_specific)
        logger.info(f"merged {args.num_shards}-shard eval over "
                    f"{len(merged)} frames")

    if results:
        logger.info(f"FINAL AP50 = {results['ap50']:.4f}")
        if args.motion_specific and results.get("per_motion"):
            for k, v in results["per_motion"].items():
                logger.info(f"AP50 | motion={k:>6s} = {v:.4f}")
        if cfg.TEST.EXPECTED_RESULTS:
            from diffusionvid_tpu.utils import check_expected_results
            check_expected_results(
                {"ap50": results["ap50"]}, cfg.TEST.EXPECTED_RESULTS,
                cfg.TEST.EXPECTED_RESULTS_SIGMA_TOL)
            logger.info("EXPECTED_RESULTS check passed")


if __name__ == "__main__":
    main()
