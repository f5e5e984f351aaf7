from modelcompression_tpu.core.mesh import MeshConfig, make_mesh
from modelcompression_tpu.parallel.sharding import (
    batch_spec, param_specs, place_train_state, replicate,
    shard_batch, shard_params,
)

__all__ = [
    "MeshConfig", "make_mesh", "batch_spec", "place_train_state",
    "param_specs", "replicate", "shard_batch", "shard_params",
]
