#!/usr/bin/env python
"""Evaluate a trained model on a VID dataset.

TPU-native equivalent of the reference ``tools/test_net.py:29-138``:
config-driven model build, checkpoint load, per-video streaming inference
sharded at video boundaries, predictions.pkl output, AP50(+motion) report.

Usage:
    python tools/test_net.py --config-file configs/vid_R_101_DiffusionVID.yaml \
        --checkpoint OUTPUT/model_0001000 [MODEL.DiffusionDet.SAMPLE_STEP 4]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser(description="DiffusionVID-TPU inference")
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--torch-weights", default=None,
                        help="convert + load a reference .pth checkpoint")
    parser.add_argument("--data-dir", default=None)
    parser.add_argument("--output-dir", default=None)
    parser.add_argument("--motion-specific", action="store_true")
    parser.add_argument("--seq-nms", action="store_true")
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
    from diffusionvid_tpu.models.diffusion_det import DiffusionDetArch, signal_to_boxes
    from diffusionvid_tpu.utils import (
        setup_logger, load_checkpoint, load_torch_checkpoint, merge_pretrained)

    cfg = load_config(args.config_file, args.opts)
    output_dir = args.output_dir or os.path.join(cfg.OUTPUT_DIR, "inference")
    logger = setup_logger(save_dir=output_dir)

    model = DiffusionDetArch.from_config(cfg)
    dataset_name = cfg.DATASETS.TEST[0]
    ds = get_dataset(dataset_name, is_train=False, data_dir=args.data_dir)
    mega = cfg.MODEL.VID.MEGA
    sample_cfg = SampleConfig(
        num_global=mega.REF_NUM_GLOBAL,
        min_size=cfg.INPUT.MIN_SIZE_TEST, max_size=cfg.INPUT.MAX_SIZE_TEST,
        global_size=mega.GLOBAL.SIZE, infer_batch=cfg.INPUT.INFER_BATCH,
        shuffle_global=mega.GLOBAL.SHUFFLE)

    # init params, then overwrite from checkpoint
    f = cfg.INPUT.INFER_BATCH
    h, w = 64, 96  # init-only shapes; params are shape-independent
    whwh = jnp.asarray([w, h, w, h], jnp.float32)
    boxes = signal_to_boxes(
        jax.random.normal(jax.random.PRNGKey(0), (f, model.num_proposals, 4)),
        whwh, 2.0)
    t = jnp.zeros((f,), jnp.int32)
    images = jnp.zeros((f, h, w, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "cfg": jax.random.PRNGKey(1)},
        images, boxes, t, num_global=1, train=False)

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

    _, _, results = run_inference(
        model, variables, ds, sample_cfg,
        sample_step=cfg.MODEL.DiffusionDet.SAMPLE_STEP,
        mem_size=mega.MEMORY_MANAGEMENT_SIZE_TEST,
        num_proposals=cfg.MODEL.DiffusionDet.NUM_PROPOSALS,
        output_dir=output_dir, use_seq_nms=args.seq_nms,
        motion_specific=args.motion_specific, logger=logger,
        shard=args.shard, num_shards=args.num_shards,
        max_videos=args.max_videos)
    if results:
        logger.info(f"FINAL AP50 = {results['ap50']:.4f}")
        if cfg.TEST.EXPECTED_RESULTS:
            from diffusionvid_tpu.utils import check_expected_results
            check_expected_results(
                {"ap50": results["ap50"]}, cfg.TEST.EXPECTED_RESULTS,
                cfg.TEST.EXPECTED_RESULTS_SIGMA_TOL)
            logger.info("EXPECTED_RESULTS check passed")


if __name__ == "__main__":
    main()
