from emojivoice_tpu.parallel.mesh import make_mesh, batch_sharding, replicated_sharding
from emojivoice_tpu.parallel.tp import (
    make_mesh_2d,
    shard_params,
    tp_shardings,
    tp_specs,
)

__all__ = [
    "make_mesh",
    "make_mesh_2d",
    "batch_sharding",
    "replicated_sharding",
    "shard_params",
    "tp_shardings",
    "tp_specs",
]
