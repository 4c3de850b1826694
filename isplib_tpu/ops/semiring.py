"""Typed semiring / fused-op specification.

This is the idiomatic replacement for the reference's 20-bit ``imsg``
bitfield opcode system (``/root/reference/csrc/fusedMM.h:8-74``), which
selects a 5-stage per-edge pipeline:

    VOP  (vector op on x_row, y_col)  → per-edge vector
    ROP  (reduce vector to scalar)    → per-edge scalar
    SOP  (scalar op, e.g. sigmoid)    → per-edge scalar
    VSC  (scale: ×value or ÷degree)   → per-edge contribution
    AOP  (accumulate into output row) → reduction semiring

Instead of bit twiddling we use a frozen dataclass of enums + optional
user callables.  Because JAX traces Python, a "user-defined" SOP is just a
jax-traceable function — no thread-safety contract needed (the reference
demands UDEF functions be thread-safe, ``csrc/fusedMM.h:127-129``; pure
functions under jit get this for free).

The reference library only ever instantiates:
``VOP_COPY_RHS | ROP_NOOP | SOP_COPY | {VSC_MUL, VSC_MEAN} |
{AOP_ADD, AOP_MAX, AOP_MIN}`` (``/root/reference/csrc/fusedmm.cpp:168-186``)
— i.e. plain SpMM with sum/mean/max/min.  We expose those as the four
``Reduce`` members plus the generalized ``FusedOp`` for
SDDMM/embedding-style pipelines (t-dist, sigmoid: ``fusedMM.h:45-52``).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Callable, Optional

import jax.numpy as jnp

__all__ = ["Reduce", "VectorOp", "ReduceOp", "ScaleOp", "FusedOp",
           "REDUCE_IDENTITY"]


class Reduce(str, enum.Enum):
    """Output accumulation semiring (reference AOP, ``fusedMM.h:65-74``
    + VSC_MEAN, ``fusedMM.h:54-63``)."""
    SUM = "sum"
    MEAN = "mean"
    MAX = "max"
    MIN = "min"

    @classmethod
    def of(cls, x) -> "Reduce":
        if isinstance(x, Reduce):
            return x
        return cls(str(x).lower())


# Neutral elements used to initialize padded / zero-degree output rows —
# the reference initializes max to float-lowest and min to float-max then
# leaves untouched rows at the neutral value (``csrc/fusedmm.cpp:147-152``);
# we instead post-mask untouched rows to 0 to match torch_sparse semantics
# (torch_sparse.matmul returns 0 for isolated nodes).
REDUCE_IDENTITY = {
    Reduce.SUM: 0.0,
    Reduce.MEAN: 0.0,
    Reduce.MAX: -jnp.inf,
    Reduce.MIN: jnp.inf,
}


class VectorOp(str, enum.Enum):
    """Per-edge vector op on (x_dst, y_src) (reference VOP,
    ``fusedMM.h:17-30``)."""
    COPY_RHS = "copy_rhs"   # message = y[col]   (plain SpMM — the hot case)
    COPY_LHS = "copy_lhs"   # message = x[row]
    ADD = "add"
    SUB = "sub"
    MUL = "mul"             # hadamard — basis for dot-product SDDMM
    MAX = "max"
    MIN = "min"


class ReduceOp(str, enum.Enum):
    """Per-edge vector→scalar reduction (reference ROP, ``fusedMM.h:32-43``)."""
    NOOP = "noop"           # keep the vector
    DOT = "dot"             # sum over features (with VOP=MUL ⇒ <x_i, y_j>)
    NORM2 = "norm2"         # squared L2 of the VOP output


class ScaleOp(str, enum.Enum):
    """Per-edge scaling (reference VSC, ``fusedMM.h:54-63``)."""
    MUL = "mul"             # × edge value
    MEAN = "mean"           # × edge value / row degree  (VSC_MEAN)
    NONE = "none"


@dataclasses.dataclass(frozen=True)
class FusedOp:
    """Full 5-stage fused SDDMM+SpMM pipeline spec.

    ``sop`` is any jax-traceable scalar function (applied elementwise to the
    per-edge scalar/vector), replacing the reference's SOP_UDEF compile-time
    hook (``fusedMM.h:45-52,133``).
    """
    vop: VectorOp = VectorOp.COPY_RHS
    rop: ReduceOp = ReduceOp.NOOP
    sop: Optional[Callable] = None
    vsc: ScaleOp = ScaleOp.MUL
    aop: Reduce = Reduce.SUM

    @classmethod
    def spmm(cls, reduce: Reduce | str) -> "FusedOp":
        r = Reduce.of(reduce)
        vsc = ScaleOp.MEAN if r is Reduce.MEAN else ScaleOp.MUL
        aop = Reduce.SUM if r in (Reduce.SUM, Reduce.MEAN) else r
        return cls(vop=VectorOp.COPY_RHS, rop=ReduceOp.NOOP, sop=None,
                   vsc=vsc, aop=aop)

    @classmethod
    def sddmm_dot(cls) -> "FusedOp":
        """Per-edge dot product <x_row, y_col> (the SDDMM the reference's
        sum/mean backward is missing, ``csrc/fusedmm.cpp:268-272``)."""
        return cls(vop=VectorOp.MUL, rop=ReduceOp.DOT, sop=None,
                   vsc=ScaleOp.NONE, aop=Reduce.SUM)
