from lanetpu.parallel.mesh import make_mesh, batch_sharding, replicated
from lanetpu.parallel.sharding import (
    make_parallel_train_step,
    make_parallel_multimodel,
    make_parallel_predict,
    shard_train_state,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "make_parallel_train_step",
    "make_parallel_multimodel",
    "make_parallel_predict",
    "shard_train_state",
]
