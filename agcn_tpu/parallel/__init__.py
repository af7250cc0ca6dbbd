from agcn_tpu.parallel.mesh import (
    batch_sharding,
    jit_data_parallel,
    make_mesh,
    replicate_state,
    replicated,
    shard_batch,
)

__all__ = ["batch_sharding", "jit_data_parallel", "make_mesh",
           "replicate_state", "replicated", "shard_batch"]
