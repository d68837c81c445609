from eigenpinns_tpu.parallel.mesh import (
    make_mesh,
    node_sharding,
    replicated,
    pad_to_multiple,
    shard_array,
)
from eigenpinns_tpu.parallel.data_parallel import make_dp_train_step, constrain
from eigenpinns_tpu.parallel.sharded import (
    ShardedOperator,
    all_gather_spmm,
    halo_spmm,
    psum_gram,
    pad_rows,
)
from eigenpinns_tpu.parallel.sharded_banded import (
    ShardedBanded,
    ShardedRemainder,
    build_sharded_operator,
    sharded_banded_spmm,
    sharded_split_spmm,
)

__all__ = [
    "make_mesh", "node_sharding", "replicated", "pad_to_multiple",
    "shard_array", "make_dp_train_step", "constrain",
    "ShardedOperator", "all_gather_spmm", "halo_spmm", "psum_gram",
    "pad_rows",
    "ShardedBanded", "ShardedRemainder", "build_sharded_operator",
    "sharded_banded_spmm", "sharded_split_spmm",
]
