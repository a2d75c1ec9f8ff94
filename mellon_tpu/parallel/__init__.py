from .mesh import (
    CELL_AXIS,
    CHAIN_AXIS,
    cell_sharding,
    chain_sharding,
    create_mesh,
    distributed_initialize,
    replicated,
)
from .sharding import (
    replicate,
    shard_chains,
    shard_density_model,
    shard_predict,
    sharded_loss_from_estimator,
)
from .checkpoint import load_sampler_state, save_sampler_state
