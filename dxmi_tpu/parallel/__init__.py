from dxmi_tpu.parallel.mesh import (  # noqa: F401
    create_mesh, shard_batch, replicate, data_sharding, is_multihost,
    process_index, sync_hosts,
)
