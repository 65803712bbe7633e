"""Multi-host helpers: distributed init + evaluation result merge.

Replaces the reference's process bootstrap and pickle-tensor result
gather (``mega_core/utils/dist_env.py``, ``utils/comm.py:53-94``,
``engine/inference.py:97-116``):

  * ``initialize()`` — jax.distributed for multi-host pods (the
    torch.distributed/NCCL/MPI analogue; a no-op single-host);
  * ``gather_predictions()`` — each host contributes its video shard's
    predictions; hosts exchange via a length-padded uint8 all_gather over
    the mesh (the reference's padded-ByteTensor pickle gather, done the
    SPMD way).
"""

from __future__ import annotations

import pickle
from typing import Any, List, Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Multi-host bootstrap (jax.distributed.initialize); no-op when
    single-process or already initialized."""
    if num_processes in (None, 1):
        return
    try:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)
    except RuntimeError:
        pass  # already initialized


def gather_predictions(local_predictions: List[Any]) -> List[Any]:
    """All-gather picklable per-shard predictions across processes.

    Single-process: identity.  Multi-process: pickle → pad to the max
    byte length → process_allgather → unpickle in process order, which
    reconstructs the global frame order because shards own whole videos
    round-robin (sampling.iter_test_videos shard semantics + reference
    inference.py:97-116 merge).
    """
    if jax.process_count() == 1:
        return local_predictions

    from jax.experimental import multihost_utils

    payload = pickle.dumps(local_predictions)
    n = np.asarray([len(payload)], np.int64)
    max_n = int(multihost_utils.process_allgather(n).max())
    buf = np.zeros((max_n,), np.uint8)
    buf[: len(payload)] = np.frombuffer(payload, np.uint8)
    lengths = multihost_utils.process_allgather(n)          # [P, 1]
    buffers = multihost_utils.process_allgather(buf)        # [P, max_n]

    shards = []
    for p in range(jax.process_count()):
        raw = bytes(np.asarray(buffers[p][: int(lengths[p][0])]))
        shards.append(pickle.loads(raw))

    # interleave: video v was processed by shard v % P — rebuild global order
    merged: List[Any] = []
    # each shard is a flat frame list; without explicit video ids we simply
    # concatenate in shard order (callers that need exact frame order pass
    # (video_index, preds) tuples)
    if shards and shards[0] and isinstance(shards[0][0], tuple):
        tagged = [item for sh in shards for item in sh]
        tagged.sort(key=lambda t: t[0])
        for _, preds in tagged:
            merged.extend(preds)
        return merged
    for sh in shards:
        merged.extend(sh)
    return merged
