"""First-dispatch stall watchdog (VERDICT r4 weak #4).

Round-4 measurements caught the FIRST dispatch of a freshly-compiled
program over the remote-TPU tunnel taking anywhere from 12.5 s to
2,019 s (program load, not compile — zero persistent-cache misses were
logged on the slow runs). A blocked host thread cannot cancel or retry
an in-flight execute RPC, so the honest client-side mitigation is to
make the stall VISIBLE while it happens instead of looking like a hang:
`watch_blocking` runs the blocking fence on the caller's thread and a
daemon timer logs an explicit, attributed warning at `warn_after_s` and
every interval after, then reports the total stall once the result
lands. Callers record the result in phase timings so decompositions
(tools/bench_e2e_decomp.py) can attribute it mechanically.
"""

from __future__ import annotations

import threading
import time


def watch_blocking(fn, logger, what: str, warn_after_s: float = 60.0):
    """Run fn() (a blocking device fence); log loudly if it stalls.

    Returns (result, stalled_seconds): stalled_seconds is 0.0 when the
    fence completed before the first warning fired.
    """
    done = threading.Event()
    t0 = time.time()

    def _watch():
        n = 0
        while not done.wait(timeout=warn_after_s):
            n += 1
            logger.warning(
                "[stall] %s still blocked after %.0fs — remote program-load "
                "stall (documented session variance: 12.5s-2019s, "
                "BENCHMARKS.md e2e section); the RPC cannot be cancelled "
                "client-side, waiting...",
                what, time.time() - t0,
            )

    watcher = threading.Thread(target=_watch, daemon=True)
    watcher.start()
    try:
        result = fn()
    finally:
        done.set()
    elapsed = time.time() - t0
    stalled = elapsed if elapsed >= warn_after_s else 0.0
    if stalled:
        logger.warning("[stall] %s completed after %.1fs", what, elapsed)
    return result, stalled
