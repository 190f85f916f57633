from probunet_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated,
    put_replicated,
    put_batch,
    put_sharded,
)
