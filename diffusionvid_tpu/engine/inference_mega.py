"""Dataset-level inference for the classic/MEGA-family architectures.

The DiffusionVID flagship has its own streaming runner
(engine/inference.py); this module drives the other meta-architectures
over a VID dataset the way the reference's method-dispatched test loop
does (engine/inference.py:26-93 + the per-method device transfer logic):

  * base  — per-frame GeneralizedRCNN;
  * dff   — key frame every KEY_FRAME_DURATION, others flow-warped;
  * fgfa  — sliding window of neighbor frames aggregated by flow weights;
  * rdn   — relation attention over the local window's ref proposals;
  * mega  — rdn + FPS global memory initialized from shuffled frames;
  * dafa  — Sparse R-CNN with temporal memory.

All return per-frame prediction dicts in original-image coordinates.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.sampling import SampleConfig, iter_test_videos
from ..evaluation.vid_eval import evaluate_vid
from ..structures.boxes import BoxArray


def _to_numpy(dets: BoxArray, i: int, scale: float, score_thresh=0.05):
    valid = np.asarray(dets.valid[i])
    scores = np.asarray(dets.scores[i])
    keep = valid & (scores > score_thresh)
    return {"boxes": np.asarray(dets.boxes[i])[keep] / scale,
            "scores": scores[keep],
            "labels": np.asarray(dets.labels[i])[keep]}


def run_inference_video_arch(model, variables, dataset, sample_cfg: SampleConfig,
                             *, method: str, key_frame_duration: int = 10,
                             fgfa_window: int = 2, logger=None,
                             max_videos: Optional[int] = None, seed: int = 0,
                             output_dir: Optional[str] = None,
                             use_seq_nms: bool = False, motion_ious=None,
                             motion_specific: bool = False,
                             shard: int = 0, num_shards: int = 1,
                             use_bbox_aug: bool = False,
                             bbox_aug_h_flip: bool = True,
                             bbox_aug_scales: tuple = (),
                             bbox_aug_max_size: int = 4000,
                             bbox_aug_scale_h_flip: bool = False,
                             shuffled_cur: bool = False,
                             all_frame_interval: int = 25,
                             key_frame_location: int = 12):
    """Evaluate a classic/MEGA-family model over a VID dataset.

    ``use_bbox_aug``: TEST.BBOX_AUG ensembling, supported for the
    single-frame ``base`` method only (engine/bbox_aug.py; reference
    bbox_aug.py:11-69) — detections from the h-flipped frame
    (``H_FLIP``) and from re-resized scale variants
    (``SCALES``/``SCALE_H_FLIP``, short side → each scale capped by
    ``MAX_SIZE``) map back to the base resized frame and merge with
    class-aware NMS.  Scale variants re-resize from the already-resized
    content region (the streaming pipeline does not keep raw frames);
    the reference re-transforms the original file, a ≤1-px sampling
    difference.  Each distinct scale bucket compiles once.  The temporal
    methods carry per-frame state that an augmented second pass would
    corrupt, so the flag raises there instead of being silently ignored.

    ``shuffled_cur``: MODEL.VID.MEGA.SHUFFLED_CUR_TEST (reference
    vid_mega.py:14, 166-186) — visit each video's frames in a per-video
    shuffled order with the local ref queue reduced to the current frame
    itself (``img_refs_l = [img]``), exercising the global-memory path
    without temporal locality.  Predictions stay frame-aligned: the
    reference stores each result at the shuffled index (``idx = idx_new``
    before ``get_groundtruth``), so only the VISITING order — and hence
    the memory-state evolution — changes.
    Returns (predictions, gt_list, results)."""
    if shuffled_cur and method != "mega":
        raise ValueError(
            f"MODEL.VID.MEGA.SHUFFLED_CUR_TEST only applies to METHOD "
            f"'mega' (got {method!r})")
    if use_bbox_aug and method != "base":
        raise ValueError(
            f"TEST.BBOX_AUG is only implemented for METHOD 'base' "
            f"(got {method!r}); the dff/fgfa/rdn/mega streaming paths "
            f"keep temporal state that h-flip TTA would invalidate")
    if motion_ious is not None and (num_shards > 1 or max_videos is not None):
        motion_ious = None   # rows align to the full dataset only
    predictions, gt_list = [], []
    tagged = []

    # jit cache keyed by (kind, static shapes): un-jitted apply dispatches
    # thousands of tiny eager ops per frame; windows at video edges give a
    # handful of distinct ref counts, each compiled once.  The per-video
    # true extents ride along as a TRACED [2] array — frames are padded to
    # one of two static buckets, so baking (h, w) in as constants would
    # recompile the whole model for every distinct video resolution.
    _jit_cache = {}

    def jitted(kind, *shapes, make):
        key = (kind, tuple(shapes))
        if key not in _jit_cache:
            _jit_cache[key] = jax.jit(make())
        return _jit_cache[key]

    for n_vid, video in enumerate(iter_test_videos(dataset, sample_cfg,
                                                   seed=seed, shard=shard,
                                                   num_shards=num_shards)):
        if max_videos is not None and n_vid >= max_videos:
            break
        whwh = video.whwh
        h, w = int(whwh[1]), int(whwh[0])
        hw = jnp.asarray([h, w], jnp.float32)   # traced per-video extents
        scale = float(whwh[0]) / float(video.frame_annos[0].width)

        frames = []
        for chunk, ids, n_valid in video.chunk_iter:
            frames.extend(list(np.asarray(chunk[:n_valid])))
        frames = np.stack(frames)
        n = len(frames)

        # mega/dafa: prime the global memory from the shuffled init frames
        state = None
        pstate = None
        pixel_mode = (method == "mega"
                      and getattr(model, "pixel_replaces_box", False))
        if method == "mega":
            state = model.init_state()
            if pixel_mode or getattr(model, "pixel_attend_global", False):
                pstate = model.init_pixel_state()
            if getattr(model, "pixel_attend_global", False):
                # global pixel cache fills FIRST, from the raw maps
                # (generalized_rcnn_mega.py:451-461); the box-memory loop
                # below then reads it to enhance the global maps
                for s in range(0, len(video.global_frames), 4):
                    g = jnp.asarray(video.global_frames[s: s + 4])
                    gupd = jitted(
                        "gpixupd", g.shape,
                        make=lambda: lambda v, pst, g: model.apply(
                            v, pst, g,
                            method=type(model).update_global_pixels))
                    pstate = gupd(variables, pstate, g)
            for s in range(0, len(video.global_frames), 4):
                g = jnp.asarray(video.global_frames[s: s + 4])
                memfeat = jitted(
                    "memfeat", g.shape,
                    make=lambda: lambda v, g, e, pst: model.apply(
                        v, g, (e[0], e[1]), pst,
                        method=type(model).memory_features))
                feats, valid = memfeat(variables, g, hw, pstate)
                upd = jitted(
                    "memupd", feats.shape,
                    make=lambda: lambda v, st, f2, va: model.apply(
                        v, st, f2, va, method=type(model).update_memory))
                state = upd(variables, state, feats, valid)
        elif method == "dafa":
            state = model.init_state()
            g = jnp.asarray(video.global_frames[:4])
            topk = jitted(
                "topk", g.shape,
                make=lambda: lambda v, g, ww: model.apply(
                    v, g, ww, method=type(model).extract_topk))
            feats = topk(variables, g, jnp.asarray(whwh))
            upd = jitted(
                "dafaupd", feats.shape,
                make=lambda: lambda v, st, f2: model.apply(
                    v, st, f2, method=type(model).update_memory))
            state = upd(variables, state, feats)

        video_preds = [None] * n
        key_feat = None
        pending = None   # 1-deep pipeline: convert prev frame's dets
        # while the device runs the current frame (async dispatch)
        order = (np.random.RandomState(seed + video.video_index)
                 .permutation(n) if shuffled_cur else np.arange(n))
        for f in order:
            f = int(f)
            cur = jnp.asarray(frames[f: f + 1])
            if method == "base":
                fn = jitted("base", cur.shape,
                            make=lambda: lambda v, c, e: model.apply(
                                v, c, (e[0], e[1]), train=False))
                dets = fn(variables, cur, hw)
            elif method == "dff":
                if f % key_frame_duration == 0:
                    key = cur
                is_key = f % key_frame_duration == 0
                fn = jitted(("dff", is_key), cur.shape,
                            make=lambda: lambda v, k2, c, e: model.apply(
                                v, k2, c, (e[0], e[1]), is_key=is_key))
                dets = fn(variables, key, cur, hw)
            elif method == "fgfa":
                lo = max(0, f - fgfa_window)
                hi = min(n, f + fgfa_window + 1)
                refs = jnp.asarray(np.concatenate(
                    [frames[lo:hi], frames[f: f + 1]]))  # cur last
                fn = jitted("fgfa", refs.shape,
                            make=lambda: lambda v, c, r, e: model.apply(
                                v, c, r, (e[0], e[1])))
                dets = fn(variables, cur, refs, hw)
            elif method == "mega" and pixel_mode:
                # pixel pipeline REPLACES the box pipeline: frame-selector
                # refs at offsets ±2^i (generalized_rcnn_mega.py:60-74);
                # offsets before the video start are masked (the real_idx
                # filter, :76-77), offsets past the end clamp to the last
                # frame (the queue's copy-last prefill, :594-596)
                from ..models.video_archs import local_pixel_frame_offsets
                offs = local_pixel_frame_offsets(
                    interval=all_frame_interval,
                    key_location=key_frame_location)
                ids = np.clip([f + o for o in offs], 0, n - 1)
                rvalid = np.asarray([f + o >= 0 for o in offs])
                refs = jnp.asarray(frames[ids])
                fn = jitted("mega_pix", refs.shape,
                            make=lambda: lambda v, c, r, rv, st, pst, e:
                            model.apply(v, c, r, rv, (e[0], e[1]), st, pst,
                                        method=type(model).pixel_call))
                dets, pstate = fn(variables, cur, refs, jnp.asarray(rvalid),
                                  state, pstate, hw)
            elif method in ("rdn", "mega"):
                if shuffled_cur:
                    lo, hi = f, f + 1     # local queue = [cur] only
                else:
                    lo = max(0, f - 2)
                    hi = min(n, f + 3)
                refs = jnp.asarray(frames[lo:hi])
                if method == "rdn":
                    fn = jitted("rdn", refs.shape,
                                make=lambda: lambda v, c, r, e: model.apply(
                                    v, c, r, (e[0], e[1])))
                    dets = fn(variables, cur, refs, hw)
                elif getattr(model, "use_stage_mem", False):
                    # per-stage long-range memory: thread the updated
                    # rings back (MEMORY.ENABLE configs)
                    fn = jitted("mega_sm", refs.shape,
                                make=lambda: lambda v, c, r, st, e: model.apply(
                                    v, c, r, (e[0], e[1]), state=st,
                                    return_state=True))
                    dets, state = fn(variables, cur, refs, state, hw)
                else:
                    fn = jitted("mega", refs.shape,
                                make=lambda: lambda v, c, r, st, e: model.apply(
                                    v, c, r, (e[0], e[1]), state=st))
                    dets = fn(variables, cur, refs, state, hw)
            elif method == "dafa":
                from .postprocess import postprocess_frame

                def make_dafa():
                    def run(v, c, ww, st, e):
                        logits, boxes = model.apply(v, c, ww, state=st)
                        return jax.vmap(lambda lg, bx: postprocess_frame(
                            lg, bx, (e[0], e[1]), model.num_proposals))(
                            logits[-1], boxes[-1])
                    return run
                fn = jitted("dafa", cur.shape, make=make_dafa)
                dets = fn(variables, cur, jnp.asarray(whwh), state, hw)
            else:
                raise ValueError(method)

            if use_bbox_aug and method == "base":
                # TTA ensembling (bbox_aug.py im_detect_bbox_aug): identity
                # + h-flip + scale variants, all mapped back to the base
                # resized frame and merged with class-aware NMS.  Flips act
                # on the CONTENT region (not the pad).
                from ..data.transforms import (
                    frame_bucket, resize_scale, transform_frame)
                from .bbox_aug import flip_boxes_back, merge_augmented
                rh_i, rw_i = int(whwh[1]), int(whwh[0])
                content = frames[f][:rh_i, :rw_i]
                det_sets = [_to_numpy(dets, 0, 1.0)]
                variants = []
                if bbox_aug_h_flip:
                    variants.append((None, True))
                for s_v in bbox_aug_scales:
                    variants.append((int(s_v), False))
                    if bbox_aug_scale_h_flip:
                        variants.append((int(s_v), True))
                for ms_v, fl in variants:
                    if ms_v is None:            # base scale
                        fr = frames[f].copy()
                        fr[:rh_i, :rw_i] = content[:, ::-1] if fl else content
                        vframe, vhw = fr[None], hw
                        vrw, vrh = rw_i, rh_i
                    else:
                        sc = resize_scale(rh_i, rw_i, ms_v, bbox_aug_max_size)
                        bkt = frame_bucket(rh_i, rw_i, ms_v, bbox_aug_max_size)
                        vrh = int(round(rh_i * sc))
                        vrw = int(round(rw_i * sc))
                        vframe = transform_frame(content, sc, fl, bkt)[None]
                        vhw = jnp.asarray([vrh, vrw], jnp.float32)
                    fn = jitted("base", vframe.shape,
                                make=lambda: lambda v, c, e: model.apply(
                                    v, c, (e[0], e[1]), train=False))
                    dv = _to_numpy(fn(variables, jnp.asarray(vframe), vhw),
                                   0, 1.0)
                    if fl:
                        dv["boxes"] = flip_boxes_back(dv["boxes"], vrw)
                    if ms_v is not None:        # BoxList.resize back
                        dv["boxes"] = dv["boxes"] * np.asarray(
                            [rw_i / vrw, rh_i / vrh] * 2, np.float32)
                    det_sets.append(dv)
                merged = merge_augmented(det_sets)
                merged["boxes"] = merged["boxes"] / scale
                video_preds[f] = merged
                continue

            if pending is not None:
                video_preds[pending[0]] = _to_numpy(pending[1], 0, scale)
            pending = (f, dets)
        if pending is not None:
            video_preds[pending[0]] = _to_numpy(pending[1], 0, scale)

        if use_seq_nms:
            from .seq_nms import seq_nms_video
            video_preds = seq_nms_video(video_preds)
        predictions.extend(video_preds)
        tagged.append((video.video_index, video_preds))
        for anno in video.frame_annos:
            gt_list.append({"boxes": anno.boxes, "labels": anno.labels})
        if logger:
            logger.info(f"[{method}] video {n_vid}: {n} frames")

    if output_dir:
        import os
        from .inference import save_predictions
        os.makedirs(output_dir, exist_ok=True)
        save_predictions(output_dir, predictions, tagged, shard, num_shards)

    results = (evaluate_vid(gt_list, predictions, motion_ious=motion_ious,
                            motion_specific=motion_specific)
               if gt_list else None)
    return predictions, gt_list, results
