from dlmc_quant_tpu.parallel.mesh import (  # noqa: F401
    data_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
