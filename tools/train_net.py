#!/usr/bin/env python
"""Train any configured meta-architecture.

TPU-native equivalent of the reference ``tools/train_net.py:154-243``:
config merge → model build via the META_ARCHITECTURE/VID.METHOD dispatcher
(``detectors.py:11-22``) → optimizer → (optional) pretrained load with
class-head skip → iteration-based train loop with checkpoint cadence and
periodic validation — on a data-parallel device mesh instead of DDP.

Usage:
    python tools/train_net.py --config-file configs/vid_R_101_DiffusionVID.yaml \
        [SOLVER.MAX_ITER 1000]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser(description="DiffusionVID-TPU training")
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--data-dir", default=None)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--pretrained", default=None,
                        help="checkpoint or torch .pth/.pkl to start from "
                             "(class head re-initialized)")
    parser.add_argument("--no-prefetch", action="store_true",
                        help="disable the background sample prefetcher")
    parser.add_argument("--profile-dir", default=None,
                        help="write a jax.profiler trace of steps 10-15 "
                             "here (view in TensorBoard/Perfetto)")
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusionvid_tpu.config import load_config
    from diffusionvid_tpu.data import (
        get_dataset, SampleConfig, build_train_sample)
    from diffusionvid_tpu.data.sampling import (
        ConcatDataset, MethodSampleSpec, build_train_sample_method)
    from diffusionvid_tpu.data.samplers import (
        aspect_ratio_group_ids, grouped_batches)
    from diffusionvid_tpu.data.prefetch import PrefetchIterator
    from diffusionvid_tpu.engine import (
        TrainBatch, TrainState, make_optimizer, make_train_step)
    from diffusionvid_tpu.engine.train_methods import make_method_train_step
    from diffusionvid_tpu.models.detectors import build_detection_model
    from diffusionvid_tpu.parallel import (
        make_mesh, make_dp_train_step, shard_batch_pytree, replicate)
    from diffusionvid_tpu.utils import (
        setup_logger, MetricLogger, MetricsWriter, save_checkpoint,
        load_checkpoint, last_checkpoint, load_torch_checkpoint,
        merge_pretrained)

    cfg = load_config(args.config_file, args.opts)
    output_dir = cfg.OUTPUT_DIR
    logger = setup_logger(save_dir=output_dir)
    logger.info(f"config:\n{cfg.dump()}")
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "config.yml"), "w") as f:
        f.write(cfg.dump())    # reference dumps merged config (train_net.py:229-232)
    from diffusionvid_tpu.utils.collect_env import collect_env_info
    logger.info(f"environment:\n{collect_env_info()}")

    method = cfg.MODEL.VID.METHOD if cfg.MODEL.VID.ENABLE else "base"
    is_diffusion = (method == "diffusion"
                    or cfg.MODEL.META_ARCHITECTURE == "DiffusionDet")
    model = build_detection_model(cfg)
    mega = cfg.MODEL.VID.MEGA
    num_global = mega.REF_NUM_GLOBAL

    # multi-scale training: keep the whole MIN_SIZE_TRAIN tuple — the
    # sampler jitters per sample (transforms.py Resize random choice)
    min_train = cfg.INPUT.MIN_SIZE_TRAIN
    # ATTENTION.ENABLE training samples local ref frames ahead of the
    # globals: the decoder's conditioned stage trains on [cur, locals…]
    # (box_head.py:325-346; frames ordered [cur, locals…, globals…])
    attn_cfg = cfg.MODEL.VID.ROI_BOX_HEAD.ATTENTION
    num_local = (mega.REF_NUM_LOCAL
                 if is_diffusion and attn_cfg.ENABLE and attn_cfg.STAGE > 0
                 else 0)
    sample_cfg = SampleConfig(
        num_global=num_global,
        num_local=num_local,
        local_min_offset=mega.MIN_OFFSET,
        local_max_offset=mega.MAX_OFFSET,
        min_size=tuple(min_train) if isinstance(min_train, (tuple, list))
        else min_train,
        max_size=cfg.INPUT.MAX_SIZE_TRAIN,
        transform=bool(cfg.INPUT.TRANSFORM),
        pixel_mean=tuple(cfg.INPUT.PIXEL_MEAN))
    spec = None if is_diffusion else MethodSampleSpec.from_config(cfg)

    datasets = [get_dataset(n, is_train=True, data_dir=args.data_dir)
                for n in cfg.DATASETS.TRAIN]

    # init (shape-independent params)
    h, w = 64, 96
    if is_diffusion:
        b = 1 + num_local + num_global
        noisy = jnp.tile(jnp.asarray([8.0, 8.0, 60.0, 40.0]),
                         (b, model.num_proposals, 1))
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "cfg": jax.random.PRNGKey(1)},
            jnp.zeros((b, h, w, 3)), noisy, jnp.zeros((b,), jnp.int32),
            num_global=num_global, train=True)
    else:
        b = 1 + spec.num_local + spec.num_mem + spec.num_global
        g = 8
        images = jnp.zeros((b, h, w, 3))
        gtb = jnp.tile(jnp.asarray([8.0, 8.0, 60.0, 40.0]), (b, g, 1))
        gtl = jnp.ones((b, g), jnp.int32)
        gtv = jnp.zeros((b, g), bool).at[:, 0].set(True)
        whwh = jnp.asarray([w, h, w, h], jnp.float32)
        rngs = {"params": jax.random.PRNGKey(0),
                "sampler": jax.random.PRNGKey(1)}
        hw = (whwh[1], whwh[0])
        l, me, gg = spec.num_local, spec.num_mem, spec.num_global
        cur = images[:1]
        if method == "base":
            variables = model.init(rngs, cur, hw, gtb[:1], gtl[:1], gtv[:1],
                                   train=True)
        elif method == "dff":
            variables = model.init(rngs, cur, images[1:2], hw, gtb[:1],
                                   gtl[:1], gtv[:1],
                                   method=type(model).train_loss)
        elif method == "fgfa":
            variables = model.init(rngs, cur, images[1:1 + l], hw, gtb[:1],
                                   gtl[:1], gtv[:1],
                                   method=type(model).train_loss)
        elif method == "rdn":
            variables = model.init(rngs, cur, images[1:1 + l], hw, gtb[0],
                                   gtl[0], gtv[0],
                                   method=type(model).train_loss)
        elif method == "mega":
            variables = model.init(
                rngs, cur, images[1:1 + l], images[1 + l:1 + l + me],
                images[1 + l + me:1 + l + me + gg], hw, gtb[0], gtl[0],
                gtv[0], method=type(model).train_loss_mega)
        elif method == "dafa":
            variables = model.init(
                rngs, cur, images[1 + l + me:1 + l + me + gg], whwh,
                gtb[:1], gtl[:1], gtv[:1], method=type(model).train_loss)
        else:
            raise ValueError(f"no train path for method {method}")
    params = variables["params"]

    pretrained = args.pretrained
    if not pretrained and cfg.MODEL.WEIGHT:
        # catalog:// / URL / path resolution (DetectronCheckpointer
        # semantics; raises with the URL to fetch when no local copy)
        from diffusionvid_tpu.utils import resolve_weight
        pretrained = resolve_weight(cfg.MODEL.WEIGHT)
    if pretrained:
        if pretrained.endswith((".pth", ".pkl")):
            conv = load_torch_checkpoint(pretrained)
        else:
            conv = load_checkpoint(pretrained)
        params, n = merge_pretrained(params, conv["params"],
                                     skip_keys=("class_logits", "cls_score"))
        logger.info(f"pretrained load: {n} tensors copied (class head fresh)")

    sol = cfg.SOLVER
    tx = make_optimizer(
        params, base_lr=sol.BASE_LR, steps=tuple(sol.STEPS), gamma=sol.GAMMA,
        warmup_iters=sol.WARMUP_ITERS, warmup_factor=sol.WARMUP_FACTOR,
        weight_decay=sol.WEIGHT_DECAY, weight_decay_bias=sol.WEIGHT_DECAY_BIAS,
        backbone_multiplier=sol.BACKBONE_MULTIPLIER,
        bias_lr_factor=sol.BIAS_LR_FACTOR,
        clip_norm=sol.CLIP_GRADIENTS.CLIP_VALUE,
        optimizer_type=sol.OPTIMIZER_TYPE,
        accumulation_steps=sol.ACCUMULATION_STEPS,
        lr_scheduler_type=sol.LR_SCHEDULER_TYPE, max_iter=sol.MAX_ITER)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    start_iter = 0

    if args.resume:
        last = last_checkpoint(output_dir)
        if last:
            loaded = load_checkpoint(last, target={"params": state.params,
                                                   "opt_state": state.opt_state,
                                                   "step": np.asarray(0)})
            state = TrainState(loaded["params"], loaded["opt_state"],
                               jnp.asarray(int(loaded["step"])))
            start_iter = int(loaded["step"])
            logger.info(f"resumed from {last} @ iter {start_iter}")

    mesh = make_mesh(cfg.TPU.MESH_DP if cfg.TPU.MESH_DP > 1 else None)
    n_dp = mesh.devices.size
    # effective global batch (reference: IMS_PER_BATCH(=1/gpu) × n_gpu ×
    # ACCUMULATION_STEPS × BATCH_REUSE_STEPS, SURVEY.md §2.3) — here one
    # sample per mesh device per step
    eff = n_dp * max(1, sol.ACCUMULATION_STEPS)
    logger.info(f"data-parallel devices: {n_dp}; effective batch/optim "
                f"step: {eff} samples (SOLVER.IMS_PER_BATCH={sol.IMS_PER_BATCH})")
    if sol.IMS_PER_BATCH > eff:
        logger.warning(
            f"IMS_PER_BATCH={sol.IMS_PER_BATCH} exceeds devices×accumulation"
            f"={eff}; raise SOLVER.ACCUMULATION_STEPS or TPU.MESH_DP to "
            f"match the reference schedule")
    if is_diffusion:
        base_step = make_train_step(model, tx, num_global)
    else:
        base_step = make_method_train_step(model, tx, spec)
    step_fn = make_dp_train_step(mesh, base_step, donate=True)
    state = replicate(mesh, state)

    # aspect-ratio-grouped batching: every batch of n_dp samples shares one
    # static padding bucket (GroupedBatchSampler semantics — mixing
    # orientations would mix array shapes)
    train_ds = ConcatDataset(datasets) if len(datasets) > 1 else datasets[0]
    group_ids = aspect_ratio_group_ids(train_ds)
    batch_iter = grouped_batches(group_ids, n_dp, seed=0)

    can_reuse = is_diffusion or (spec is not None and spec.num_global > 0)
    reuse_steps = max(1, int(sol.BATCH_REUSE_STEPS)) if can_reuse else 1

    # Resume determinism: every random draw is derived from the ITERATION
    # index, not from process-lifetime RNG state, so a run resumed from a
    # checkpoint at iteration k consumes exactly the data (and step RNG)
    # the uninterrupted run would have at k — bit-exact continuation
    # (pinned by tests/test_resume_bitexact.py).  Batches are (re)loaded
    # at iterations ≡ 0 (mod BATCH_REUSE_STEPS); fast-forward the cheap
    # index iterator past the ones a resumed run already consumed.
    for _ in range((start_iter + reuse_steps - 1) // reuse_steps):
        next(batch_iter)

    def build_sample(ds, i, srng):
        if is_diffusion:
            if isinstance(ds, ConcatDataset):
                return ds.sample(i, srng, sample_cfg)
            return build_train_sample(ds, i, srng, sample_cfg)
        if isinstance(ds, ConcatDataset):
            sub, local = ds._locate(i)
            return build_train_sample_method(sub, local, srng,
                                             sample_cfg, spec)
        return build_train_sample_method(ds, i, srng, sample_cfg, spec)

    def sample_batches():
        """Host-side sample loading, run ahead of the device by the
        prefetcher (the reference hides this in 16 dataloader workers,
        DATALOADER.NUM_WORKERS)."""
        it = start_iter
        while True:
            srng = np.random.RandomState((1000003 * it + 12345) % (2**31 - 1))
            yield [build_sample(train_ds, i, srng) for i in next(batch_iter)]
            it = (it // reuse_steps + 1) * reuse_steps

    batches = sample_batches()
    if not args.no_prefetch:
        batches = PrefetchIterator(batches, depth=2)

    meters = MetricLogger()
    writer = MetricsWriter(output_dir, resume_step=start_iter if args.resume else None)
    base_rng = jax.random.PRNGKey(3)
    t_last = time.perf_counter()

    from diffusionvid_tpu.utils.profiling import StepProfiler
    val_failures = 0
    prof = StepProfiler(args.profile_dir, start=start_iter + 10,
                        stop=start_iter + 15)

    samples = None
    for it in range(start_iter, sol.MAX_ITER):
        prof.step(it)
        if samples is None or it % reuse_steps == 0:
            samples = next(batches)
        else:
            # batch reuse (engine/trainer.py:107-124): swap the current
            # frame with a random global ref and retrain on the same
            # loaded batch — another gradient step with zero host IO.
            # Iteration-derived RNG (resume determinism; also keeps the
            # prefetch thread's draws independent of this thread)
            reuse_rng = np.random.RandomState((7654321 + it) % (2**31 - 1))
            first_g = (1 + num_local if is_diffusion
                       else 1 + spec.num_local + spec.num_mem)
            for smp in samples:
                j = reuse_rng.randint(first_g, smp["images"].shape[0])
                for key in ("images", "gt_boxes", "gt_labels", "gt_valid"):
                    smp[key][[0, j]] = smp[key][[j, 0]]
        batch = TrainBatch(
            images=jnp.asarray(np.stack([s["images"] for s in samples])),
            gt_boxes=jnp.asarray(np.stack([s["gt_boxes"] for s in samples])),
            gt_labels=jnp.asarray(np.stack([s["gt_labels"] for s in samples])),
            gt_valid=jnp.asarray(np.stack([s["gt_valid"] for s in samples])),
            whwh=jnp.asarray(np.stack([s["whwh"] for s in samples])))
        batch = shard_batch_pytree(mesh, batch)
        r = jax.random.fold_in(base_rng, it)   # iteration-derived (resume)
        state, metrics = step_fn(state, batch, r)

        if (it + 1) % 20 == 0:
            vals = {k: float(v) for k, v in metrics.items()}
            meters.update(**vals)
            dt = (time.perf_counter() - t_last) / 20
            t_last = time.perf_counter()
            logger.info(f"iter {it + 1}/{sol.MAX_ITER} {meters} "
                        f"({dt:.3f}s/it)")
            writer.write(it + 1, sec_per_iter=dt,
                         **{f"Train/{k}": v for k, v in vals.items()})
        if (sol.TEST_PERIOD and (it + 1) % sol.TEST_PERIOD == 0
                and cfg.DATASETS.TEST):
            # periodic validation (engine/trainer.py:187-207 semantics).
            # A missing val dataset is tolerable (synthetic / partial
            # trees); anything else must not be swallowed forever — after
            # two consecutive failures the run aborts so a permanently
            # broken val path cannot hide behind warnings.
            try:
                val_ds = get_dataset(cfg.DATASETS.TEST[0], is_train=False,
                                     data_dir=args.data_dir)
                val_cfg = SampleConfig(
                    num_global=num_global,
                    min_size=cfg.INPUT.MIN_SIZE_TEST,
                    max_size=cfg.INPUT.MAX_SIZE_TEST,
                    global_size=mega.GLOBAL.SIZE,
                    infer_batch=cfg.INPUT.INFER_BATCH)
                val_params = {"params": jax.device_get(state.params)}
                if is_diffusion:
                    from diffusionvid_tpu.engine.inference import run_inference
                    _, _, results = run_inference(
                        model, val_params, val_ds,
                        val_cfg, sample_step=cfg.MODEL.DiffusionDet.SAMPLE_STEP,
                        mem_size=mega.MEMORY_MANAGEMENT_SIZE_TEST,
                        num_proposals=cfg.MODEL.DiffusionDet.NUM_PROPOSALS,
                        max_videos=20, logger=logger)
                else:
                    from diffusionvid_tpu.engine.inference_mega import (
                        run_inference_video_arch)
                    _, _, results = run_inference_video_arch(
                        model, val_params, val_ds, val_cfg, method=method,
                        key_frame_duration=cfg.MODEL.VID.DFF.KEY_FRAME_DURATION,
                        max_videos=5, logger=logger)
                if results:
                    writer.write(it + 1, **{"Val/mAP": results["ap50"]})
                val_failures = 0
            except FileNotFoundError as e:
                logger.warning(f"periodic validation skipped (no data): {e}")
            except Exception as e:
                val_failures += 1
                if val_failures >= 2:
                    raise
                logger.warning(
                    f"periodic validation failed ({val_failures}/2): {e}")
        if (it + 1) % sol.CHECKPOINT_PERIOD == 0 or (it + 1) == sol.MAX_ITER:
            save_checkpoint(output_dir, it + 1,
                            jax.device_get(state.params),
                            jax.device_get(state.opt_state))
            logger.info(f"checkpoint @ {it + 1}")
    prof.close()


if __name__ == "__main__":
    main()
