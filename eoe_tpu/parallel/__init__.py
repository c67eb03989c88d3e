from eoe_tpu.parallel.mesh import (  # noqa: F401
    MeshConfig,
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    param_shardings,
)
