from crossscore_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    local_batch_sharding,
    local_view_mesh,
    replicated,
    param_shardings,
    shard_batch,
)
