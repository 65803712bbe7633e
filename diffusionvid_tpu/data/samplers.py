"""Batch samplers: aspect-ratio grouping + iteration-based epochs.

Replaces the reference sampler stack (``mega_core/data/samplers/``):

  * ``GroupedBatchSampler`` — batches only combine indices from the same
    aspect-ratio group (grouped_batch_sampler.py); here groups map 1:1 to
    the static padding buckets (landscape/portrait), so every batch is a
    single compiled shape;
  * ``IterationBasedBatchSampler`` — infinite epoch-seeded resampling up
    to a target iteration count (iteration_based_batch_sampler.py);
  * ``DistributedSampler`` rank sharding (distributed.py:10-66) — the
    ``shard``/``num_shards`` arguments;
  * the video-boundary test sharding (VIDTestDistributedSampler,
    distributed.py:69-115) lives in sampling.iter_test_videos.
"""

from __future__ import annotations

from typing import Iterator, List, Sequence

import numpy as np


def aspect_ratio_group_ids(dataset) -> np.ndarray:
    """Group id per frame: 0 = landscape (w >= h), 1 = portrait — exactly
    the static-bucket split of transforms.frame_bucket."""
    ids = np.zeros(len(dataset), np.int64)
    for i, anno in enumerate(dataset.annos):
        ids[i] = 0 if anno.width >= anno.height else 1
    return ids


def grouped_batches(group_ids: np.ndarray, batch_size: int, *,
                    seed: int = 0, shard: int = 0, num_shards: int = 1,
                    max_iterations: int | None = None) -> Iterator[List[int]]:
    """Infinite stream of index batches; each batch is drawn from one
    aspect-ratio group, epoch-reshuffled, rank-sharded."""
    epoch = 0
    emitted = 0
    while True:
        rng = np.random.RandomState(seed + epoch)
        order = rng.permutation(len(group_ids))[shard::num_shards]
        buffers: dict = {}
        for idx in order:
            g = int(group_ids[idx])
            buffers.setdefault(g, []).append(int(idx))
            if len(buffers[g]) == batch_size:
                yield buffers.pop(g)
                emitted += 1
                if max_iterations is not None and emitted >= max_iterations:
                    return
        epoch += 1
