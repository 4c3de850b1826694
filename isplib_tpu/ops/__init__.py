from .semiring import Reduce, FusedOp, VectorOp, ReduceOp, ScaleOp
from .spmm import spmm, sddmm, set_default_backend
from .fused import fused_mm, fused_mm_edges

__all__ = ["Reduce", "FusedOp", "VectorOp", "ReduceOp", "ScaleOp",
           "spmm", "sddmm", "set_default_backend", "fused_mm", "fused_mm_edges"]
