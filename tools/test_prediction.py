#!/usr/bin/env python
"""Re-evaluate saved predictions without running a model.

Equivalent of the reference ``tools/test_prediction.py:23-87`` /
``inference_no_model`` (engine/inference.py:184-209).

Usage:
    python tools/test_prediction.py --config-file configs/... \
        --predictions OUTPUT/inference/predictions.pkl [--motion-specific]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--predictions", required=True)
    parser.add_argument("--data-dir", default=None)
    parser.add_argument("--motion-iou-file", default=None)
    parser.add_argument("--motion-specific", action="store_true")
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    args = parser.parse_args()

    from diffusionvid_tpu.config import load_config
    from diffusionvid_tpu.data import get_dataset
    from diffusionvid_tpu.engine.inference import inference_no_model
    from diffusionvid_tpu.evaluation import load_motion_iou_mat
    from diffusionvid_tpu.utils import setup_logger

    cfg = load_config(args.config_file, args.opts)
    logger = setup_logger()
    ds = get_dataset(cfg.DATASETS.TEST[0], is_train=False,
                     data_dir=args.data_dir)
    motion = (load_motion_iou_mat(args.motion_iou_file)
              if args.motion_iou_file else None)
    results = inference_no_model(args.predictions, ds, motion_ious=motion,
                                 motion_specific=args.motion_specific)
    logger.info(f"AP50 = {results['ap50']:.4f}")
    for k, v in results["per_motion"].items():
        logger.info(f"AP50 | motion={k:>6s} = {v:.4f}")
    if cfg.TEST.EXPECTED_RESULTS:
        from diffusionvid_tpu.utils import check_expected_results
        check_expected_results({"ap50": results["ap50"]},
                               cfg.TEST.EXPECTED_RESULTS,
                               cfg.TEST.EXPECTED_RESULTS_SIGMA_TOL)
        logger.info("EXPECTED_RESULTS check passed")


if __name__ == "__main__":
    main()
