from .multihost import initialize, gather_predictions
from .mesh import (
    make_mesh, dp_shardings, shard_batch_pytree, replicate, make_dp_train_step,
)

__all__ = ["make_mesh", "dp_shardings", "shard_batch_pytree", "replicate",
           "make_dp_train_step", "initialize", "gather_predictions"]
