"""Profiling / tracing — replaces the reference's commented std::chrono
env-var timers (``/root/reference/csrc/fusedmm.cpp:52-53,190-201``) and
py-spy recipes (``tests/dist/gcn/pyg-sparse.py:119-131``) with the JAX
profiler plus a structured per-op timing harness."""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Callable

from .timing import chain_time, drain

__all__ = ["trace", "op_report", "Timer"]


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/isplib_tpu_trace"):
    """Capture a JAX/XLA profiler trace viewable in TensorBoard/Perfetto.

    NOTE: through a tunneled TPU backend device-side traces may be
    unavailable; host-side tracing still records dispatch structure.
    """
    import jax
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def op_report(named_fns: dict[str, tuple[Callable, object]],
              iters: int = 20) -> dict[str, float]:
    """Time a dict of ``name -> (chainable_fn, x0)`` and return seconds per
    call for each (chained methodology — see utils.timing)."""
    out = {}
    for name, (fn, x0) in named_fns.items():
        out[name] = chain_time(fn, x0, iters)
    return out


class Timer:
    """Cheap named wall-clock sections with a JSON report (host-side)."""

    def __init__(self):
        self.sections: dict[str, float] = {}

    @contextlib.contextmanager
    def section(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                drain(sync)
            self.sections[name] = (self.sections.get(name, 0.0)
                                   + time.perf_counter() - t0)

    def report(self) -> str:
        return json.dumps(self.sections, indent=1)
