"""ctypes bindings for the native graph-preprocessing library.

The C++/OpenMP library (``native/graphbuild.cpp``) provides linear-time
CSR sorting, Pallas tiling-plan construction, and R-MAT generation — the
host-side native layer of the framework (the device compute layer is
Pallas).  Everything degrades gracefully to the numpy implementations
when the shared object hasn't been built; build it with:

    python -m isplib_tpu.native.build
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

__all__ = ["available", "sort_csr", "plan_chunks", "plan_chunks_v2",
           "rmat", "lib_path"]

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def lib_path() -> str:
    env = os.environ.get("ISPLIB_NATIVE_LIB")
    if env:
        return env
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(here, "native", "libisplib_graph.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = lib_path()
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None

    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)

    lib.isplib_sort_csr.argtypes = [
        i32p, i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        i32p, i64p, i32p]
    lib.isplib_plan_count.restype = ctypes.c_int64
    lib.isplib_plan_count.argtypes = [
        i32p, i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        i64p, i64p, i64p]
    lib.isplib_plan_fill.argtypes = [
        i32p, i32p, f32p, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        i64p, i64p, ctypes.c_int64, i32p, i32p]
    lib.isplib_rmat.argtypes = [
        ctypes.c_int64, ctypes.c_int32, ctypes.c_uint64,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, i32p, i32p]
    lib.isplib_version.restype = ctypes.c_int
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    if hasattr(lib, "isplib_bsr_count"):
        lib.isplib_bsr_count.argtypes = [
            i32p, i32p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int64, ctypes.c_int64, i32p]
        lib.isplib_bsr_fill.argtypes = [
            i32p, i32p, f32p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
            i64p, u16p, u8p]
        lib.isplib_compact_residual.restype = ctypes.c_int64
        lib.isplib_compact_residual.argtypes = [
            i32p, i32p, f32p, u8p, ctypes.c_int64, i32p, i32p, f32p]
    if hasattr(lib, "isplib_plan_v2_count"):
        lib.isplib_plan_v2_count.restype = ctypes.c_int64
        lib.isplib_plan_v2_count.argtypes = [
            i32p, i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            i64p, i64p, i64p, ctypes.c_int64, i32p]
        lib.isplib_plan_v2_fill.argtypes = [
            i32p, i32p, f32p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            i64p, i64p, i32p]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def sort_csr(row: np.ndarray, col: np.ndarray, num_rows: int,
             num_cols: int) -> tuple[np.ndarray, np.ndarray]:
    """Stable (row, col) sort.  Returns (order int32, rowptr int64)."""
    lib = _load()
    assert lib is not None
    nnz = int(row.shape[0])
    row = np.ascontiguousarray(row, np.int32)
    col = np.ascontiguousarray(col, np.int32)
    order = np.empty(nnz, np.int32)
    rowptr = np.empty(num_rows + 1, np.int64)
    scratch = np.empty(nnz, np.int32)
    lib.isplib_sort_csr(
        _ptr(row, ctypes.c_int32), _ptr(col, ctypes.c_int32),
        nnz, num_rows, num_cols,
        _ptr(order, ctypes.c_int32), _ptr(rowptr, ctypes.c_int64),
        _ptr(scratch, ctypes.c_int32))
    return order, rowptr


def plan_chunks(row: np.ndarray, col: np.ndarray, val: np.ndarray,
                num_rows: int, num_cols: int,
                rb: int, ct: int, eb: int):
    """Build packed tiling-plan arrays from CSR-sorted COO.

    Returns (edges_packed (nc,3,eb) int32, rb_ids, ct_ids, chunk_starts).
    """
    lib = _load()
    assert lib is not None
    nnz = int(row.shape[0])
    row = np.ascontiguousarray(row, np.int32)
    col = np.ascontiguousarray(col, np.int32)
    val = np.ascontiguousarray(val, np.float32)
    nrb = -(-num_rows // rb)
    chunk_of = np.empty(nnz, np.int64)
    rank = np.empty(nnz, np.int64)
    chunk_starts = np.empty(nrb + 1, np.int64)
    nc = lib.isplib_plan_count(
        _ptr(row, ctypes.c_int32), _ptr(col, ctypes.c_int32), nnz,
        num_rows, num_cols, rb, ct, eb,
        _ptr(chunk_of, ctypes.c_int64), _ptr(rank, ctypes.c_int64),
        _ptr(chunk_starts, ctypes.c_int64))
    edges = np.zeros((nc, 3, eb), np.int32)
    ct_ids = np.zeros(nc, np.int32)
    lib.isplib_plan_fill(
        _ptr(row, ctypes.c_int32), _ptr(col, ctypes.c_int32),
        _ptr(val, ctypes.c_float), nnz, rb, ct, eb,
        _ptr(chunk_of, ctypes.c_int64), _ptr(rank, ctypes.c_int64), nc,
        _ptr(edges, ctypes.c_int32), _ptr(ct_ids, ctypes.c_int32))
    rb_ids = np.repeat(np.arange(nrb, dtype=np.int32),
                       np.diff(chunk_starts))
    return edges, rb_ids, ct_ids, chunk_starts.astype(np.int32)


def has_plan_v2() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "isplib_plan_v2_count")


def plan_chunks_v2(row: np.ndarray, col: np.ndarray, val: np.ndarray,
                   num_rows: int, num_cols: int,
                   rb: int, ct: int, eb: int, nrb_s: int):
    """Build v2 packed plan arrays from CSR-sorted COO.

    Returns (edges (nc,3,eb) int32 [cols|vals|rows], rb_locals (nc,) i32,
    cell_starts (n_super*nct+1,) i32).
    """
    lib = _load()
    assert lib is not None
    nnz = int(row.shape[0])
    row = np.ascontiguousarray(row, np.int32)
    col = np.ascontiguousarray(col, np.int32)
    val = np.ascontiguousarray(val, np.float32)
    nrb = -(-num_rows // rb)
    nct = -(-num_cols // ct)
    n_super = -(-nrb // nrb_s)
    chunk_of = np.empty(nnz, np.int64)
    rank = np.empty(nnz, np.int64)
    cell_starts = np.empty(n_super * nct + 1, np.int64)
    # upper bound on chunks: one partial chunk per non-empty bucket + full
    # chunks; nnz/eb + nrb*nct is safe and cheap to allocate (int32 each)
    cap = nnz // eb + nrb * nct + 1
    rb_locals = np.zeros(cap, np.int32)
    nc = lib.isplib_plan_v2_count(
        _ptr(row, ctypes.c_int32), _ptr(col, ctypes.c_int32), nnz,
        num_rows, num_cols, rb, ct, eb, nrb_s,
        _ptr(chunk_of, ctypes.c_int64), _ptr(rank, ctypes.c_int64),
        _ptr(cell_starts, ctypes.c_int64), cap,
        _ptr(rb_locals, ctypes.c_int32))
    assert nc <= cap, "chunk-count bound violated"
    edges = np.zeros((nc, 3, eb), np.int32)
    lib.isplib_plan_v2_fill(
        _ptr(row, ctypes.c_int32), _ptr(col, ctypes.c_int32),
        _ptr(val, ctypes.c_float), nnz, rb, ct, eb,
        _ptr(chunk_of, ctypes.c_int64), _ptr(rank, ctypes.c_int64),
        _ptr(edges, ctypes.c_int32))
    return edges, rb_locals[:nc], cell_starts.astype(np.int32)


def has_bsr() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "isplib_bsr_count")


def bsr_count(row: np.ndarray, col: np.ndarray, bs: int,
              n_br: int, n_bc: int) -> np.ndarray:
    """Per-(bs x bs)-block edge counts of a row-sorted edge list.

    Returns (n_br*n_bc,) int32.
    """
    lib = _load()
    assert lib is not None
    row = np.ascontiguousarray(row, np.int32)
    col = np.ascontiguousarray(col, np.int32)
    counts = np.zeros(n_br * n_bc, np.int32)
    lib.isplib_bsr_count(
        _ptr(row, ctypes.c_int32), _ptr(col, ctypes.c_int32),
        int(row.shape[0]), bs, n_br, n_bc, _ptr(counts, ctypes.c_int32))
    return counts


def bsr_fill(row: np.ndarray, col: np.ndarray, val: np.ndarray,
             bs: int, n_br: int, n_bc: int, g: int,
             rank: np.ndarray, nb_padded: int):
    """Densify ranked blocks into grouped bf16 layout.

    ``rank``: (n_br*n_bc,) int64 output slot per block (-1 = stays
    sparse).  Returns (blocks (nb_padded//g, bs, g*bs) uint16-as-bf16,
    is_dense (nnz,) uint8).
    """
    lib = _load()
    assert lib is not None
    nnz = int(row.shape[0])
    row = np.ascontiguousarray(row, np.int32)
    col = np.ascontiguousarray(col, np.int32)
    val = np.ascontiguousarray(val, np.float32)
    rank = np.ascontiguousarray(rank, np.int64)
    blocks = np.zeros((nb_padded // g, bs, g * bs), np.uint16)
    is_dense = np.zeros(nnz, np.uint8)
    lib.isplib_bsr_fill(
        _ptr(row, ctypes.c_int32), _ptr(col, ctypes.c_int32),
        _ptr(val, ctypes.c_float), nnz, bs, n_br, n_bc, g,
        _ptr(rank, ctypes.c_int64), _ptr(blocks, ctypes.c_uint16),
        _ptr(is_dense, ctypes.c_uint8))
    return blocks, is_dense


def compact_residual(row: np.ndarray, col: np.ndarray, val: np.ndarray,
                     is_dense: np.ndarray):
    """Compact the not-densified edges, keeping CSR order."""
    lib = _load()
    assert lib is not None
    nnz = int(row.shape[0])
    row = np.ascontiguousarray(row, np.int32)
    col = np.ascontiguousarray(col, np.int32)
    val = np.ascontiguousarray(val, np.float32)
    is_dense = np.ascontiguousarray(is_dense, np.uint8)
    out_row = np.empty(nnz, np.int32)
    out_col = np.empty(nnz, np.int32)
    out_val = np.empty(nnz, np.float32)
    n = lib.isplib_compact_residual(
        _ptr(row, ctypes.c_int32), _ptr(col, ctypes.c_int32),
        _ptr(val, ctypes.c_float), _ptr(is_dense, ctypes.c_uint8), nnz,
        _ptr(out_row, ctypes.c_int32), _ptr(out_col, ctypes.c_int32),
        _ptr(out_val, ctypes.c_float))
    return out_row[:n], out_col[:n], out_val[:n]


def rmat(num_edges: int, num_nodes: int, seed: int = 0,
         a: float = 0.57, b: float = 0.19, c: float = 0.19):
    """Parallel R-MAT generator.  Returns (src, dst) int32 (self-loops
    included; callers filter)."""
    lib = _load()
    assert lib is not None
    src = np.empty(num_edges, np.int32)
    dst = np.empty(num_edges, np.int32)
    lib.isplib_rmat(num_edges, num_nodes, seed, a, b, c,
                    _ptr(src, ctypes.c_int32), _ptr(dst, ctypes.c_int32))
    return src, dst
