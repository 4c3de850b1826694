from .semiring import Reduce, FusedOp, VectorOp, ReduceOp, ScaleOp
from .spmm import spmm, sddmm, set_default_backend

__all__ = ["Reduce", "FusedOp", "VectorOp", "ReduceOp", "ScaleOp",
           "spmm", "sddmm", "set_default_backend"]
