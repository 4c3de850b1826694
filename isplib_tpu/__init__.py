"""isplib_tpu — a TPU-native sparse GNN message-passing framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
HipGraph/iSpLib (reference mounted at /root/reference): semiring SpMM
(sum/mean/max/min) over CSR adjacencies with full autograd, fused
SDDMM+SpMM pipelines, a runtime tile/backend autotuner, a flax layer API
(GCN / GraphSAGE / GIN), and multi-chip scaling via shard_map-partitioned
adjacencies with halo exchange over ICI.
"""

from .sparse.graph import CSRGraph, from_edge_index, from_scipy
from .sparse.tiling import TiledGraph, build_tiling
from .ops.spmm import spmm, sddmm, set_default_backend
from .ops.fused import fused_mm, fused_mm_edges
from .ops.semiring import Reduce, FusedOp, VectorOp, ReduceOp, ScaleOp

__version__ = "0.1.0"

__all__ = [
    "CSRGraph",
    "from_edge_index",
    "from_scipy",
    "TiledGraph",
    "build_tiling",
    "spmm",
    "sddmm",
    "fused_mm",
    "fused_mm_edges",
    "set_default_backend",
    "Reduce",
    "FusedOp",
    "VectorOp",
    "ReduceOp",
    "ScaleOp",
    "__version__",
]
