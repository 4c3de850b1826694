"""Runtime backend/tile autotuner (skeleton — measurement pass lands with the
Pallas kernels).

Replaces two offline human-in-the-loop tuners in the reference:

* the per-graph K sweep over FusedMM's benchmark binary
  (``/root/reference/autotuner/findbestk.py:34-45``), and
* the CUDA block-size sweep ``argmin over 1..1024 variants``
  (``/root/reference/gpu/timer.cpp:10-22``).

Here tuning is automatic: variants are timed in-process on compiled
functions and decisions are persisted to a JSON cache keyed by a graph
signature (rows, cols, nnz, avg/max degree, K, dtype, device kind).
"""

from __future__ import annotations

import json
import os
import threading
from typing import Any

import jax

_CACHE_PATH = os.environ.get(
    "ISPLIB_TPU_TUNE_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "isplib_tpu", "tune.json"),
)
_lock = threading.Lock()
_memory_cache: dict[str, Any] | None = None


def signature_of(graph, k: int, dtype: str = "float32") -> str:
    avg_deg = graph.nnz / max(graph.num_rows, 1)
    dev = jax.devices()[0].platform
    return (
        f"r{graph.num_rows}_c{graph.num_cols}_e{graph.nnz}"
        f"_d{avg_deg:.1f}_k{k}_{dtype}_{dev}"
    )


def graph_signature(graph, x) -> str:
    return signature_of(graph, int(x.shape[-1]), str(x.dtype))


def _load_cache() -> dict[str, Any]:
    global _memory_cache
    with _lock:
        if _memory_cache is None:
            try:
                with open(_CACHE_PATH) as f:
                    _memory_cache = json.load(f)
            except (OSError, json.JSONDecodeError):
                _memory_cache = {}
        return _memory_cache


def _save_cache(cache: dict[str, Any]) -> None:
    with _lock:
        os.makedirs(os.path.dirname(_CACHE_PATH), exist_ok=True)
        tmp = _CACHE_PATH + ".tmp"
        with open(tmp, "w") as f:
            json.dump(cache, f, indent=1)
        os.replace(tmp, _CACHE_PATH)


def record(key: str, entry: dict[str, Any]) -> None:
    cache = _load_cache()
    cache[key] = entry
    _save_cache(cache)


def lookup(key: str) -> dict[str, Any] | None:
    return _load_cache().get(key)


DEFAULT_CONFIGS = [
    # (rb, ct, eb, version) — multiples of 128, spanning the VPU-work vs
    # chunk-padding tradeoff (analog of the reference's K sweep
    # findbestk.py:34 and CUDA block-size sweep timer.cpp:10-22).
    # version 2 = column-major streaming kernel (usually fastest);
    # version 1 = row-block grid kernel.
    (128, 512, 512, 2),
    (256, 512, 512, 2),
    (256, 1024, 512, 2),
    (512, 512, 1024, 2),
    (256, 512, 512, 1),
    (512, 512, 512, 1),
]


def tune_spmm(
    graph,
    arrays: dict,
    k: int = 32,
    configs=None,
    iters: int = 15,
    include_xla: bool = True,
    verbose: bool = True,
):
    """Measure SpMM configurations on the attached device and persist the
    winner, keyed by graph signature.

    ``graph`` is the device CSRGraph; ``arrays`` its host-numpy dict (plan
    building must not read back through the device).  Returns
    (best_entry, tiled_graph_or_None).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..ops.spmm import spmm
    from ..sparse.tiling import build_tiling_from_numpy
    from ..utils.timing import chain_time

    x = jnp.asarray(
        np.random.default_rng(0).normal(
            size=(graph.num_cols, k)).astype(np.float32))
    key = graph_signature(graph, x)
    results = []

    # Graphs are jit ARGUMENTS (not closure constants) so the big edge
    # arrays never enter the HLO constant pool — closure capture overflows
    # remote-compile payload limits on tunneled TPU runtimes.
    if include_xla:
        jf = jax.jit(lambda x_, g_: spmm(g_, x_, backend="xla") * 1e-3)
        f = lambda x_: jf(x_, graph)
        dt = chain_time(f, x, iters)
        results.append(dict(backend="xla", seconds=dt,
                            edges_per_s=graph.nnz / dt))
        if verbose:
            print(f"[tune] xla: {dt * 1e3:.2f} ms "
                  f"({graph.nnz / dt / 1e9:.3f} Ge/s)")

    best_tiled = None
    for cfg in (configs or DEFAULT_CONFIGS):
        rb, ct, eb = cfg[:3]
        version = cfg[3] if len(cfg) > 3 else 2
        try:
            tg = build_tiling_from_numpy(graph, arrays, rb=rb, ct=ct, eb=eb,
                                         build_backward=False,
                                         version=version, k=k)
            jf = jax.jit(lambda x_, tg_: spmm(tg_, x_,
                                              backend="pallas") * 1e-3)
            f = lambda x_, tg_=tg: jf(x_, tg_)
            dt = chain_time(f, x, iters)
            entry = dict(backend="pallas", rb=rb, ct=ct, eb=eb,
                         version=version, seconds=dt,
                         edges_per_s=graph.nnz / dt, fill=tg.fwd.fill)
            results.append(entry)
            if verbose:
                print(f"[tune] pallas v{version} rb={rb} ct={ct} eb={eb} "
                      f"fill={tg.fwd.fill:.2f}: {dt * 1e3:.2f} ms "
                      f"({graph.nnz / dt / 1e9:.3f} Ge/s)")
        except Exception as ex:  # config may exceed VMEM etc.
            if verbose:
                print(f"[tune] pallas v{version} rb={rb} ct={ct} eb={eb} "
                      f"failed: {str(ex)[:120]}")

    best = min(results, key=lambda r: r["seconds"])
    record(key, best)
    if best["backend"] == "pallas":
        best_tiled = build_tiling_from_numpy(
            graph, arrays, rb=best["rb"], ct=best["ct"], eb=best["eb"],
            version=best.get("version", 2), k=k)
    if verbose:
        print(f"[tune] best: {best}")
    return best, best_tiled


def lookup_backend(graph, x) -> str:
    """Backend decision for ``spmm(..., backend='auto')``.

    Consults the measured cache first; otherwise a static heuristic.
    NOTE: called at trace time — must stay cheap and return a static str.
    """
    try:
        entry = lookup(graph_signature(graph, x))
        if entry and "backend" in entry:
            return entry["backend"]
    except Exception:
        pass
    return "xla"
