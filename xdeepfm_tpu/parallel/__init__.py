from .mesh import (
    make_mesh,
    param_sharding_rule,
    shard_batch,
    shard_params,
    shard_model_state,
)
