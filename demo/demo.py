#!/usr/bin/env python
"""Visualization demo: run DiffusionVID-TPU on a folder of frames or a
video file and write annotated images/video.

Equivalent of the reference ``demo/demo.py`` + ``demo/predictor.py``
(VIDDemo: per-frame streaming inference replicated outside the dataset,
box overlay, image or video output).

Usage:
    python demo/demo.py --config-file configs/vid_R_101_DiffusionVID.yaml \
        --checkpoint OUTPUT/model_0001000 \
        [--visualize-path path/to/frames_or.mp4] [--output-folder out/]
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from diffusionvid_tpu.data.vid_dataset import VID_CLASSES

PALETTE = np.array([2 ** 25 - 1, 2 ** 15 - 1, 2 ** 21 - 1])


def label_color(label: int):
    c = (int(label) * PALETTE) % 255
    return tuple(int(v) for v in c)


def overlay_boxes(img_bgr, boxes, scores, labels, score_thresh=0.5):
    import cv2
    out = img_bgr.copy()
    for box, score, label in zip(boxes, scores, labels):
        if score < score_thresh:
            continue
        x1, y1, x2, y2 = [int(round(v)) for v in box]
        color = label_color(label)
        cv2.rectangle(out, (x1, y1), (x2, y2), color, 2)
        name = VID_CLASSES[int(label)] if 0 <= int(label) < len(VID_CLASSES) else str(label)
        cv2.putText(out, f"{name}:{score:.2f}", (x1, max(y1 - 4, 10)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
    return out


def read_frames(path):
    """Folder of images or a video file → list of BGR frames + names."""
    import cv2
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.JPEG"))
                       + glob.glob(os.path.join(path, "*.jpg"))
                       + glob.glob(os.path.join(path, "*.png")))
        return [cv2.imread(f) for f in files], [os.path.basename(f) for f in files]
    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(frame)
    cap.release()
    return frames, [f"{i:06d}.jpg" for i in range(len(frames))]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--visualize-path", required=True)
    parser.add_argument("--output-folder", default="demo_out")
    parser.add_argument("--score-thresh", type=float, default=0.5)
    parser.add_argument("--output-video", action="store_true")
    parser.add_argument("--track-refs", action="store_true",
                        help="MEGA/RDN: also save each frame's top-5 "
                             "reference-frame proposal overlays "
                             "(reference predictor.py track_refs)")
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    args = parser.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from diffusionvid_tpu.config import load_config
    from diffusionvid_tpu.data.transforms import (
        frame_bucket, resize_scale, transform_frame)
    from diffusionvid_tpu.engine import StreamingDetector
    from diffusionvid_tpu.models.diffusion_det import DiffusionDetArch, signal_to_boxes
    from diffusionvid_tpu.utils import load_checkpoint, setup_logger

    logger = setup_logger()
    cfg = load_config(args.config_file, args.opts)
    from diffusionvid_tpu.models.detectors import build_detection_model
    model = build_detection_model(cfg)
    if not isinstance(model, DiffusionDetArch):
        return demo_classic(cfg, model, args, logger)
    f = cfg.INPUT.INFER_BATCH

    frames_bgr, names = read_frames(args.visualize_path)
    assert frames_bgr, f"no frames at {args.visualize_path}"
    h0, w0 = frames_bgr[0].shape[:2]
    scale = resize_scale(h0, w0, cfg.INPUT.MIN_SIZE_TEST, cfg.INPUT.MAX_SIZE_TEST)
    bucket = frame_bucket(h0, w0, cfg.INPUT.MIN_SIZE_TEST, cfg.INPUT.MAX_SIZE_TEST)
    rw, rh = int(round(w0 * scale)), int(round(h0 * scale))
    whwh = jnp.asarray([rw, rh, rw, rh], jnp.float32)

    def prep(img_bgr):
        rgb = cv2.cvtColor(img_bgr, cv2.COLOR_BGR2RGB).astype(np.float32)
        return transform_frame(rgb, scale, False, bucket)

    # init params / load checkpoint
    boxes0 = signal_to_boxes(
        jax.random.normal(jax.random.PRNGKey(0), (f, model.num_proposals, 4)),
        whwh, 2.0)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "cfg": jax.random.PRNGKey(1)},
        jnp.zeros((f, *bucket, 3)), boxes0, jnp.zeros((f,), jnp.int32),
        num_global=1, train=False)
    if args.checkpoint:
        variables = {"params": load_checkpoint(args.checkpoint)["params"]}
        logger.info(f"loaded {args.checkpoint}")

    mega = cfg.MODEL.VID.MEGA
    det = StreamingDetector(
        model, variables, infer_batch=f,
        sample_step=cfg.MODEL.DiffusionDet.SAMPLE_STEP,
        mem_size=mega.MEMORY_MANAGEMENT_SIZE_TEST,
        num_proposals=cfg.MODEL.DiffusionDet.NUM_PROPOSALS)

    # global memory from evenly spaced frames
    ginit = np.linspace(0, len(frames_bgr) - 1,
                        min(mega.GLOBAL.SIZE, len(frames_bgr))).astype(int)
    gframes = jnp.asarray(np.stack([prep(frames_bgr[i]) for i in ginit]))
    state = det.start_video(jax.random.PRNGKey(2), gframes, whwh)

    os.makedirs(args.output_folder, exist_ok=True)
    writer = None
    for start in range(0, len(frames_bgr), f):
        chunk = frames_bgr[start: start + f]
        n_valid = len(chunk)
        while len(chunk) < f:
            chunk.append(chunk[-1])
        batch = jnp.asarray(np.stack([prep(c) for c in chunk]))
        state, dets = det.process_chunk(state, batch, whwh)
        for i in range(n_valid):
            keep = np.asarray(dets.valid[i])
            boxes = np.asarray(dets.boxes[i])[keep] / scale
            scores = np.asarray(dets.scores[i])[keep]
            labels = np.asarray(dets.labels[i])[keep]
            vis = overlay_boxes(frames_bgr[start + i], boxes, scores, labels,
                                args.score_thresh)
            if args.output_video:
                if writer is None:
                    path = os.path.join(args.output_folder, "demo.avi")
                    writer = cv2.VideoWriter(
                        path, cv2.VideoWriter_fourcc(*"MJPG"), 25, (w0, h0))
                writer.write(vis)
            else:
                cv2.imwrite(os.path.join(args.output_folder,
                                         names[start + i]), vis)
        logger.info(f"processed {start + n_valid}/{len(frames_bgr)}")
    if writer is not None:
        writer.release()
    logger.info(f"output written to {args.output_folder}")


def demo_classic(cfg, model, args, logger):
    """Classic/MEGA-family demo path: per-frame detection with a local ref
    window, mirroring the dispatched test loop (engine/inference_mega.py) —
    the reference VIDDemo supports the same methods via cfg."""
    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusionvid_tpu.data.transforms import (
        frame_bucket, resize_scale, transform_frame)
    from diffusionvid_tpu.utils import load_checkpoint

    method = cfg.MODEL.VID.METHOD if cfg.MODEL.VID.ENABLE else "base"
    frames_bgr, names = read_frames(args.visualize_path)
    assert frames_bgr, f"no frames at {args.visualize_path}"
    h0, w0 = frames_bgr[0].shape[:2]
    scale = resize_scale(h0, w0, cfg.INPUT.MIN_SIZE_TEST,
                         cfg.INPUT.MAX_SIZE_TEST)
    bucket = frame_bucket(h0, w0, cfg.INPUT.MIN_SIZE_TEST,
                          cfg.INPUT.MAX_SIZE_TEST)
    rh, rw = int(round(h0 * scale)), int(round(w0 * scale))
    hw = (rh, rw)     # true resized extent (boxes clip here, not the pad)

    def prep(img_bgr):
        rgb = cv2.cvtColor(img_bgr, cv2.COLOR_BGR2RGB).astype(np.float32)
        return transform_frame(rgb, scale, False, bucket)

    frames = np.stack([prep(c) for c in frames_bgr])
    n = len(frames)
    cur0 = jnp.zeros((1, *bucket, 3))
    refs0 = jnp.zeros((2, *bucket, 3))
    if method == "base":
        variables = model.init(jax.random.PRNGKey(0), cur0, hw)
    elif method == "dff":
        variables = model.init(jax.random.PRNGKey(0), cur0, cur0, hw,
                               is_key=False)
    elif method in ("rdn", "fgfa"):
        variables = model.init(jax.random.PRNGKey(0), cur0, refs0, hw)
    elif method == "mega":
        variables = model.init(jax.random.PRNGKey(0), cur0, refs0, hw,
                               state=model.init_state())
    else:
        raise SystemExit(f"demo does not drive method {method}")
    if args.checkpoint:
        variables = {"params": load_checkpoint(args.checkpoint)["params"]}
        logger.info(f"loaded {args.checkpoint}")

    _cache = {}

    def jitted(key, make):
        if key not in _cache:
            _cache[key] = jax.jit(make())
        return _cache[key]

    state = None
    if method == "mega":
        # prime the FPS global memory from evenly spaced frames
        # (generalized_rcnn_mega.py:446-526 init_global)
        state = model.init_state()
        ginit = np.linspace(0, n - 1, min(8, n)).astype(int)
        for s0 in range(0, len(ginit), 4):
            g = jnp.asarray(frames[ginit[s0: s0 + 4]])
            memfeat = jitted(("memfeat", g.shape),
                             lambda: lambda v, g, e: model.apply(
                                 v, g, (e[0], e[1]),
                                 method=type(model).memory_features))
            feats, valid = memfeat(variables, g, jnp.asarray([rh, rw],
                                                            jnp.float32))
            upd = jitted(("memupd", feats.shape),
                         lambda: lambda v, st, f2, va: model.apply(
                             v, st, f2, va,
                             method=type(model).update_memory))
            state = upd(variables, state, feats, valid)

    os.makedirs(args.output_folder, exist_ok=True)
    writer = None
    key = None
    for fidx in range(n):
        cur = jnp.asarray(frames[fidx: fidx + 1])
        if method == "base":
            fn = jitted("base", lambda: lambda v, c: model.apply(
                v, c, hw, train=False))
            dets = fn(variables, cur)
        elif method == "dff":
            if fidx % cfg.MODEL.VID.DFF.KEY_FRAME_DURATION == 0:
                key = cur
            is_key = fidx % cfg.MODEL.VID.DFF.KEY_FRAME_DURATION == 0
            fn = jitted(("dff", is_key), lambda: lambda v, k, c: model.apply(
                v, k, c, hw, is_key=is_key))
            dets = fn(variables, key, cur)
        else:
            lo = max(0, fidx - 2)
            hi = min(n, fidx + 3)
            refs = jnp.asarray(
                np.concatenate([frames[lo:hi], frames[fidx: fidx + 1]])
                if method == "fgfa" else frames[lo:hi])
            if method == "mega":
                if getattr(model, "use_stage_mem", False):
                    fn = jitted(("mega_sm", refs.shape),
                                lambda: lambda v, c, r, st: model.apply(
                                    v, c, r, hw, state=st,
                                    return_state=True))
                    dets, state = fn(variables, cur, refs, state)
                else:
                    fn = jitted(("mega", refs.shape),
                                lambda: lambda v, c, r, st: model.apply(
                                    v, c, r, hw, state=st))
                    dets = fn(variables, cur, refs, state)
            else:
                fn = jitted((method, refs.shape),
                            lambda: lambda v, c, r: model.apply(
                                v, c, r, hw))
                dets = fn(variables, cur, refs)

        keep = np.asarray(dets.valid[0]) & (np.asarray(dets.scores[0])
                                            > args.score_thresh)
        boxes = np.asarray(dets.boxes[0])[keep] / scale
        scores = np.asarray(dets.scores[0])[keep]
        labels = np.asarray(dets.labels[0])[keep]
        vis = overlay_boxes(frames_bgr[fidx], boxes, scores, labels,
                            args.score_thresh)
        if args.track_refs and method in ("rdn", "mega"):
            # ref-box track overlay (reference predictor.py:588-605): draw
            # the top-5 reference-frame proposals on their source frames
            lo = max(0, fidx - 2)
            hi = min(n, fidx + 3)
            rp = jitted(("refprops", hi - lo),
                        lambda: lambda v, r, e: model.apply(
                            v, r, (e[0], e[1]),
                            method=type(model).ref_proposals))
            rboxes, rvalid = rp(variables, jnp.asarray(frames[lo:hi]),
                                jnp.asarray([rh, rw], jnp.float32))
            for j, fid in enumerate(range(lo, hi)):
                bset = np.asarray(rboxes[j])[np.asarray(rvalid[j])][:5]
                img = overlay_boxes(frames_bgr[fid], bset / scale,
                                    np.ones(len(bset)),
                                    np.zeros(len(bset), int), 0.0)
                cv2.imwrite(os.path.join(
                    args.output_folder,
                    f"{fidx:06d}_ref{j}_fid{fid}.jpg"), img)
        if args.output_video:
            if writer is None:
                path = os.path.join(args.output_folder, "demo.avi")
                writer = cv2.VideoWriter(
                    path, cv2.VideoWriter_fourcc(*"MJPG"), 25, (w0, h0))
            writer.write(vis)
        else:
            cv2.imwrite(os.path.join(args.output_folder, names[fidx]), vis)
        if (fidx + 1) % 10 == 0:
            logger.info(f"[{method}] processed {fidx + 1}/{n}")
    if writer is not None:
        writer.release()
    logger.info(f"output written to {args.output_folder}")


if __name__ == "__main__":
    main()
