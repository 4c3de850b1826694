"""Device timing utilities.

Replaces the reference's ad-hoc std::chrono / wall-clock harnesses
(``/root/reference/csrc/fusedmm.cpp:52-53``, ``tests/cpu/gcn-sparse.py:83-93``)
with a methodology that is correct on asynchronous/tunneled TPU runtimes:
``jax.block_until_ready`` can return before device execution completes on
tunneled PJRT backends (measured in this environment), and a device→host
readback costs ~0.5 s of latency — so per-call walls are noise.  We chain
calls (output feeds input) and drain the serial device queue once.
"""

from __future__ import annotations

import time
from typing import Callable

import jax.numpy as jnp

__all__ = ["chain_time", "drain"]


def drain(x) -> float:
    """Force completion of everything queued before x (device executes
    serially); returns a scalar readback of x."""
    return float(jnp.sum(x))


def chain_time(f: Callable, x0, iters: int = 20, verbose: bool = False,
               repeats: int = 3) -> float:
    """Seconds per call of ``f`` (whose output must feed its input).

    Subtracts single-call + readback latency measured separately, so the
    result reflects steady-state device throughput.  The chain is run
    ``repeats`` times and the MINIMUM per-call estimate is returned:
    tunneled-TPU chains show ±20% run-to-run noise (queue keep-alives,
    host scheduling), and the minimum is the standard noise-robust
    estimator for a deterministic workload.
    """
    def say(msg):
        if verbose:
            import sys
            print(f"[chain_time] {msg} +{time.perf_counter() - t_ref:.1f}s",
                  file=sys.stderr, flush=True)

    t_ref = time.perf_counter()
    o = f(x0)
    say("traced+compiled (async)")
    drain(o)  # compile + warm
    say("warmup drained")
    t0 = time.perf_counter()
    o = f(x0)
    drain(o)
    lat1 = time.perf_counter() - t0
    say(f"single-call latency {lat1 * 1e3:.1f} ms")
    best = None
    for r in range(max(repeats, 1)):
        t0 = time.perf_counter()
        o = x0
        for _ in range(iters):
            o = f(o)
        drain(o)
        total = time.perf_counter() - t0
        say(f"chain {r + 1}/{repeats} of {iters} done")
        # Chains must dwarf BOTH ~60 ms of work AND ~5x the single-call
        # latency: per_call subtracts lat1 (which embeds the tunnel's
        # ~40 ms readback RTT), so a chain comparable to lat1 leaves the
        # RTT's run-to-run variance as the dominant error — min-of-N
        # then picks the luckiest fluctuation and can exceed the
        # physical bound (observed 103% of the HBM bound).
        target = max(0.06, 5.0 * lat1)
        if r == 0 and repeats > 1 and total < target and iters >= 10:
            scale = int(target / max(total, 1e-4)) + 1
            if scale > 1:
                iters *= scale
                say(f"chain too short ({total * 1e3:.1f} ms vs target "
                    f"{target * 1e3:.0f} ms) — extending to {iters} iters")
                continue
        per_call = (total - lat1) / max(iters - 1, 1)
        if per_call <= 0 or iters < 10:
            # tiny graphs / few iters: the latency estimate's variance
            # swamps the subtraction (observed vs_baseline > 1 on smoke
            # runs — impossible by construction).  Report the
            # un-subtracted, conservative mean instead.
            per_call = total / iters
        best = per_call if best is None else min(best, per_call)
    return best
