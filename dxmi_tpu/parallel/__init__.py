from dxmi_tpu.parallel.mesh import (  # noqa: F401
    create_mesh, shard_batch, replicate, data_sharding, global_batch,
    is_multihost, process_index, sync_hosts,
)
from dxmi_tpu.parallel.tp import (  # noqa: F401
    shard_params_tp, tp_sharding_tree,
)
