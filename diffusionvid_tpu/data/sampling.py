"""Train-sample construction and streaming-video iteration.

Replaces the reference's ``VIDMEGADataset`` loading logic
(``mega_core/data/datasets/vid_mega.py``):

  * training (vid_mega.py:35-163): one sample = current frame + REF_NUM_GLOBAL
    random global frames of the same video, each with its own GT; DET stills
    replicate the current frame as the single global ref (vid_mega.py:88-103,
    flagship path: LOCAL/MEMORY disabled);
  * testing (vid_mega.py:165-255): per-video streaming — a shuffled global
    index seeds GLOBAL.SIZE init frames at frame 0
    (STOP_UPDATE_AFTER_INIT_TEST=True → memory frozen afterwards), then the
    video is consumed in INFER_BATCH chunks (the reference's ahead-of-key
    local-window reads are exactly chunked consumption when
    KEY_FRAME_LOCATION=0 and ALL_FRAME_INTERVAL==INFER_BATCH).

Everything is host-side numpy; device transfer happens in the engine.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, List, Optional

import numpy as np

from .transforms import frame_bucket, resize_scale, transform_frame
from .vid_dataset import VIDDataset, pad_groundtruth


@dataclass
class SampleConfig:
    num_global: int = 4
    max_gt: int = 64
    min_size: int = 600            # int or tuple → random scale jitter
    max_size: int = 1000
    hflip_prob: float = 0.5
    global_size: int = 24       # init frames for the test-time memory
    infer_batch: int = 8
    shuffle_global: bool = True


def build_train_sample(ds: VIDDataset, idx: int, rng: np.random.RandomState,
                       cfg: SampleConfig):
    """One training sample: dict of images [B,H,W,3] (B = 1 + num_global),
    padded GT arrays, whwh.  All frames share the cur frame's resize scale,
    flip decision, and padding bucket (transforms.py:61-87)."""
    anno = ds.get_groundtruth(idx)
    # multi-scale training: MIN_SIZE_TRAIN may be a tuple (transforms.py
    # Resize random choice); the padding bucket uses the LARGEST min size
    # so every scale fits the same static shape
    min_sizes = (cfg.min_size if isinstance(cfg.min_size, (tuple, list))
                 else (cfg.min_size,))
    min_size = int(min_sizes[rng.randint(len(min_sizes))])
    scale = resize_scale(anno.height, anno.width, min_size, cfg.max_size)
    flip = bool(rng.rand() < cfg.hflip_prob)
    bucket = frame_bucket(anno.height, anno.width, max(min_sizes),
                          cfg.max_size)

    frames: List[np.ndarray] = []
    gts = []

    img = ds.load_image(ds.image_path(idx))
    frames.append(transform_frame(img, scale, flip, bucket))
    gts.append(pad_groundtruth(anno, cfg.max_gt, scale, flip))

    if ds.is_video:
        seg_len = ds.frame_seg_len[idx]
        replace = seg_len < cfg.num_global
        ref_ids = rng.choice(seg_len, cfg.num_global, replace=replace)
        for rid in ref_ids:
            ranno = ds.get_groundtruth_for_frame(idx, int(rid))
            rimg = ds.load_image(ds.frame_path(idx, int(rid)))
            frames.append(transform_frame(rimg, scale, flip, bucket))
            gts.append(pad_groundtruth(ranno, cfg.max_gt, scale, flip))
    else:
        # DET stills: replicate cur as the global refs (vid_mega.py:96-103
        # uses one copy; we tile to keep the batch shape static).
        for _ in range(cfg.num_global):
            frames.append(frames[0])
            gts.append(gts[0])

    boxes = np.stack([g[0] for g in gts])
    labels = np.stack([g[1] for g in gts])
    valid = np.stack([g[2] for g in gts])
    rh = int(round(anno.height * scale))
    rw = int(round(anno.width * scale))
    whwh = np.asarray([rw, rh, rw, rh], np.float32)
    return {
        "images": np.stack(frames),
        "gt_boxes": boxes, "gt_labels": labels, "gt_valid": valid,
        "whwh": whwh, "bucket": tuple(frames[0].shape[:2]),
    }


def train_sample_stream(ds: VIDDataset, cfg: SampleConfig, seed: int = 0,
                        shard: int = 0, num_shards: int = 1) -> Iterator[dict]:
    """Infinite epoch-shuffled stream of train samples, rank-sharded
    (DistributedSampler + IterationBasedBatchSampler semantics,
    samplers/distributed.py:10-66, iteration_based_batch_sampler.py)."""
    epoch = 0
    while True:
        rng = np.random.RandomState(seed + epoch)
        order = rng.permutation(len(ds))
        for i in order[shard::num_shards]:
            yield build_train_sample(ds, int(i), rng, cfg)
        epoch += 1


class ConcatDataset:
    """Concatenation of frame datasets (reference: torch ConcatDataset over
    DET_train_30classes + VID_train_15frames, data/build.py).  Exposes the
    VIDDataset surface used by sampling/grouping."""

    def __init__(self, datasets):
        self.datasets = list(datasets)
        self.offsets = [0]
        for d in self.datasets:
            self.offsets.append(self.offsets[-1] + len(d))

    def __len__(self):
        return self.offsets[-1]

    def _locate(self, idx: int):
        for i in range(len(self.datasets)):
            if idx < self.offsets[i + 1]:
                return self.datasets[i], idx - self.offsets[i]
        raise IndexError(idx)

    @property
    def annos(self):
        out = []
        for d in self.datasets:
            out.extend(d.annos)
        return out

    def sample(self, idx, rng, cfg):
        ds, local = self._locate(idx)
        return build_train_sample(ds, local, rng, cfg)


@dataclass
class VideoChunks:
    """One test video, ready for the streaming engine."""
    video_index: int
    seg_len: int
    global_frames: np.ndarray        # [Ginit, H, W, 3]
    whwh: np.ndarray                 # [4]
    bucket: tuple
    chunk_iter: Iterator             # yields (frames [F,H,W,3], frame_ids, n_valid)
    frame_annos: list                # per-frame FrameAnno (for eval)


def iter_test_videos(ds: VIDDataset, cfg: SampleConfig, seed: int = 0,
                     shard: int = 0, num_shards: int = 1) -> Iterator[VideoChunks]:
    """Iterate whole videos, sharded at video boundaries
    (VIDTestDistributedSampler, samplers/distributed.py:69-115)."""
    starts = ds.video_starts()
    for vi, s in enumerate(starts):
        if vi % num_shards != shard:
            continue
        seg_len = ds.frame_seg_len[s]
        anno0 = ds.get_groundtruth(s)
        scale = resize_scale(anno0.height, anno0.width, cfg.min_size, cfg.max_size)
        bucket = frame_bucket(anno0.height, anno0.width, cfg.min_size, cfg.max_size)
        rh = int(round(anno0.height * scale))
        rw = int(round(anno0.width * scale))
        whwh = np.asarray([rw, rh, rw, rh], np.float32)

        rng = np.random.RandomState(seed + vi)
        perm = rng.permutation(seg_len) if cfg.shuffle_global else np.arange(seg_len)
        ginit = perm[: min(cfg.global_size, seg_len)]
        gframes = np.stack([
            transform_frame(ds.load_image(ds.frame_path(s, int(g))), scale,
                            False, bucket) for g in ginit])

        def chunks(s=s, seg_len=seg_len, scale=scale, bucket=bucket):
            f = cfg.infer_batch
            for start in range(0, seg_len, f):
                ids = list(range(start, min(start + f, seg_len)))
                imgs = [transform_frame(ds.load_image(ds.frame_path(s, i)),
                                        scale, False, bucket) for i in ids]
                n_valid = len(ids)
                while len(imgs) < f:   # pad the tail chunk
                    imgs.append(imgs[-1])
                    ids.append(ids[-1])
                yield np.stack(imgs), ids, n_valid

        annos = [ds.get_groundtruth_for_frame(s, i) for i in range(seg_len)]
        yield VideoChunks(vi, seg_len, gframes, whwh, bucket, chunks(), annos)
