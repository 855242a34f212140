from rrnet_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    shard_batch,
    replicate,
)
