from .partition import ShardedGraph, partition_rows
from .spmm_dist import spmm_sharded, pad_features, unpad_output

__all__ = ["ShardedGraph", "partition_rows", "spmm_sharded",
           "pad_features", "unpad_output"]
