"""Fixed-size diverse global memory (DiffusionVID's FPS-dedup memory).

Replaces ``update_erase_memory`` (``diffusion_det.py:841-867``): the global
proposal-feature memory is a fixed budget of slots kept maximally diverse by
greedy farthest-point sampling.  The reference grows/shrinks ragged tensors;
here the memory is a static ``[capacity, D]`` buffer plus a valid count so
the whole update is one jit with static shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .fps import pairwise_l2_distance, farthest_point_sample


class FeatureMemory(NamedTuple):
    feats: jnp.ndarray  # [capacity, D]
    count: jnp.ndarray  # [] int32, number of valid (prefix) slots


def init_memory(capacity: int, dim: int, dtype=jnp.float32) -> FeatureMemory:
    return FeatureMemory(jnp.zeros((capacity, dim), dtype),
                         jnp.zeros((), jnp.int32))


def update_erase_memory(mem: FeatureMemory, new_feats, new_count) -> FeatureMemory:
    """Merge new features into the memory, FPS-dedup down to capacity.

    Args:
      mem: current memory (valid slots are a prefix of length ``mem.count``).
      new_feats: [M, D] candidate features (valid prefix of ``new_count``).
      new_count: [] int32 number of valid new features.

    Matches reference semantics (diffusion_det.py:841-867): if the merged
    set fits, keep everything (memory first, then new, order preserved);
    otherwise greedily select ``capacity`` max-min-distance features.
    """
    capacity, d = mem.feats.shape
    m = new_feats.shape[0]
    n = capacity + m

    merged = jnp.concatenate([mem.feats, new_feats.astype(mem.feats.dtype)], axis=0)
    ar = jnp.arange(n)
    valid = jnp.where(ar < capacity, ar < mem.count, (ar - capacity) < new_count)

    total = mem.count + new_count
    use_fps = total > capacity

    # Compaction indices: memory prefix then new prefix, back to back.
    i = jnp.arange(capacity)
    compact_idx = jnp.where(i < mem.count, i, capacity + (i - mem.count)).astype(jnp.int32)

    dist = pairwise_l2_distance(merged)
    fps_idx = farthest_point_sample(dist, capacity, valid=valid)

    idx = jnp.where(use_fps, fps_idx, compact_idx)
    out = merged[jnp.clip(idx, 0, n - 1)]
    out_count = jnp.minimum(total, capacity).astype(jnp.int32)
    # Zero invalid tail so downstream attention masks can rely on it.
    keep = (jnp.arange(capacity) < out_count)[:, None]
    return FeatureMemory(jnp.where(keep, out, 0.0), out_count)
