from eigenpinns_tpu.parallel.mesh import (
    make_mesh,
    node_sharding,
    replicated,
    pad_to_multiple,
    shard_array,
)
from eigenpinns_tpu.parallel.data_parallel import make_dp_train_step, constrain

__all__ = [
    "make_mesh", "node_sharding", "replicated", "pad_to_multiple",
    "shard_array", "make_dp_train_step", "constrain",
]
