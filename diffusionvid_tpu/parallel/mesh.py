"""Device-mesh data parallelism.

TPU-native replacement for the reference's NCCL/DDP stack
(``mega_core/utils/{comm,dist_env,distributed}.py``, ``tools/train_net.py:54-60``):

  reference                              TPU rebuild
  -------------------------------------  -------------------------------------
  torch.distributed.init_process_group   jax.distributed.initialize (multi-host)
  DistributedDataParallel all-reduce     psum inserted by XLA from shardings
  DistributedSampler per-rank shard      batch sharded on the 'dp' mesh axis
  pickle all_gather of predictions       jax.experimental.multihost_utils /
                                         process_allgather at eval merge

SPMD model: one ``Mesh`` with a 'dp' axis (and room for an 'sp' spatial
axis for giant images); params replicated, batches sharded.  XLA emits the
gradient all-reduce over ICI automatically — there is no NCCL-analogue code
to write, which is the point.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    dp = dp or len(devices)
    return Mesh(np.asarray(devices[:dp]).reshape(dp), ("dp",))


def dp_shardings(mesh: Mesh):
    """(replicated, batch-sharded) NamedShardings for a data-parallel mesh."""
    replicated = NamedSharding(mesh, P())
    batch = NamedSharding(mesh, P("dp"))
    return replicated, batch


def shard_batch_pytree(mesh: Mesh, batch):
    """Shard every leaf of a batch pytree on its leading axis over 'dp'."""
    _, batch_sharding = dp_shardings(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, batch_sharding), batch)


def replicate(mesh: Mesh, tree):
    rep, _ = dp_shardings(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)


def make_dp_train_step(mesh: Mesh, train_step, donate: bool = False):
    """jit the train step with DP shardings: state/rng replicated, batch
    sharded on 'dp'.  The loss mean + grad psum over the axis falls out of
    XLA's SPMD partitioner (the DDP all-reduce equivalent).

    ``donate=True`` donates the train state buffers (use in the real train
    loop; leave off when the caller keeps references to the old state)."""
    rep = NamedSharding(mesh, P())
    b = NamedSharding(mesh, P("dp"))
    return jax.jit(
        train_step,
        in_shardings=(rep, b, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate else (),
    )
