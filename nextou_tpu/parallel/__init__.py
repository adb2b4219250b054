from nextou_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    batch_sharding,
)
from nextou_tpu.parallel.distributed import (
    distributed_requested,
    initialize_distributed,
    local_share,
)
