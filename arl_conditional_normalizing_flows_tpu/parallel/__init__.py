from arl_conditional_normalizing_flows_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    initialize_distributed,
    make_2d_mesh,
    make_mesh,
    param_shardings,
    replicate,
    shard_batch,
    state_shardings,
)
