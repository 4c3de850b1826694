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


def graph_signature(graph, x) -> str:
    avg_deg = graph.nnz / max(graph.num_rows, 1)
    dev = jax.devices()[0].platform
    return (
        f"r{graph.num_rows}_c{graph.num_cols}_e{graph.nnz}"
        f"_d{avg_deg:.1f}_k{x.shape[-1]}_{x.dtype}_{dev}"
    )


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
