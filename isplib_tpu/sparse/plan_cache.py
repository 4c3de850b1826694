"""Persistent cache for built tiling plans.

The reference keeps its tuning offline precisely so the measured run is
cheap (``/root/reference/autotuner/findbestk.py:34-45``, the build-time
FusedMM autotuner via ``/root/reference/configure``).  The analog here:
plan construction (tens of seconds of host work for 100M-edge graphs,
historically 40 s for the 5.7M-edge bench graph on the numpy path) is
done once and the packed plan arrays are persisted next to the graph
cache, so a warm benchmark or training run starts in plan-load time
(~1 s of pickle I/O) instead of plan-build time.

Plans are stored with **numpy leaves** (the builders produce host plans;
device upload happens once per process via
:func:`isplib_tpu.utils.transfer.tree_device_put`).  The cache key folds
in every plan-shaping parameter plus a format version, so stale entries
can never be misread as current ones.
"""

from __future__ import annotations

import hashlib
import json
import os
import pickle
import tempfile
from typing import Optional

import numpy as np

__all__ = ["plan_cache_path", "save_host_plans", "load_host_plans",
           "default_cache_dir", "graph_fingerprint"]

# Bump when the packed plan layout or the TiledPlan* dataclasses change
# incompatibly — old cache entries are then simply missed, never misread.
# v5: StreamPlanV4 block group lists padded to gd multiples (the kernel
# no longer predicates overread groups).
PLAN_FORMAT_VERSION = 5


def default_cache_dir() -> str:
    d = os.environ.get("ISPLIB_TPU_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "isplib_tpu")
    os.makedirs(d, exist_ok=True)
    return d


def plan_cache_path(tag: str, cfg: dict, cache_dir: Optional[str] = None
                    ) -> str:
    """Deterministic cache file path for (graph tag, plan config)."""
    cache_dir = cache_dir or default_cache_dir()
    key = json.dumps({"fmt": PLAN_FORMAT_VERSION, "tag": tag,
                      **{k: cfg[k] for k in sorted(cfg)}},
                     sort_keys=True)
    h = hashlib.sha256(key.encode()).hexdigest()[:16]
    return os.path.join(cache_dir, f"plan_{tag}_{h}.pkl")


def save_host_plans(path: str, plans: dict) -> None:
    """Atomically persist a dict of host-leaf (numpy) plan pytrees."""
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            pickle.dump(plans, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def load_host_plans(path: str) -> Optional[dict]:
    """Load a plan dict saved by :func:`save_host_plans`; None on miss.

    Decode failures are treated as misses but logged (ADVICE r3: a
    silently-swallowed exception here masks real corruption bugs).
    Note the cache uses pickle — only point ``ISPLIB_TPU_CACHE_DIR`` at
    directories you trust, as for any pickle store."""
    if not os.path.exists(path):
        return None
    try:
        with open(path, "rb") as f:
            return pickle.load(f)
    except Exception as e:  # noqa: BLE001
        import sys
        print(f"[isplib_tpu] plan cache entry {path} failed to decode "
              f"({type(e).__name__}: {str(e)[:80]}) — rebuilding",
              file=sys.stderr)
        return None


def graph_fingerprint(arrays: dict, nnz: int) -> str:
    """Cheap content hash of the actual edge structure (ADVICE r3
    medium: size statistics alone let two different graphs share plan
    cache entries, silently producing wrong SpMM results).  crc32 over
    the rowptr plus head/tail slices of the column array."""
    import zlib
    rp = arrays.get("rowptr", arrays["row"][:nnz])
    h = zlib.crc32(np.ascontiguousarray(rp).tobytes())
    col = arrays["col"][:nnz]
    n = min(65536, col.shape[0])
    h = zlib.crc32(np.ascontiguousarray(col[:n]).tobytes(), h)
    h = zlib.crc32(np.ascontiguousarray(col[-n:]).tobytes(), h)
    val = arrays.get("value")
    if val is not None and val.shape[0]:
        h = zlib.crc32(np.ascontiguousarray(val[:n]).tobytes(), h)
    return f"{h:08x}"
