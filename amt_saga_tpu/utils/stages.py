"""Lightweight accumulating stage timers for the host emission chain.

The end-to-end WAV->MIDI wall is device dispatch + HOST emission (refit,
duration fit, the spectral-evidence chain, MIDI write), and on a 1-core
host the emission side dominates (VERDICT r3 item 1: 27,669 device-only
vs 6,901 e2e audio-sec/s).  These timers attribute that host time per
stage with near-zero overhead when disabled (one module-bool check), so
``bench.py --e2e`` can print an honest breakdown and the optimization
loop targets the real bottleneck.

Thread-safe: emission lanes may run in a ThreadPoolExecutor; each
``add`` takes a short lock.  Times ACCUMULATE across calls until
``snapshot(reset=True)``.
"""

from __future__ import annotations

import threading
import time
from collections import defaultdict
from contextlib import contextmanager

_ENABLED = False
_LOCK = threading.Lock()
_TOTALS: dict[str, float] = defaultdict(float)
_COUNTS: dict[str, int] = defaultdict(int)


def enable(on: bool = True) -> None:
    global _ENABLED
    _ENABLED = on


def enabled() -> bool:
    return _ENABLED


def add(stage: str, seconds: float) -> None:
    if not _ENABLED:
        return
    with _LOCK:
        _TOTALS[stage] += seconds
        _COUNTS[stage] += 1


@contextmanager
def timed(stage: str):
    """Accumulate wall time of the with-block under ``stage`` (no-op
    when disabled)."""
    if not _ENABLED:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        add(stage, time.perf_counter() - t0)


def snapshot(reset: bool = False) -> dict[str, dict]:
    """{stage: {"s": total_seconds, "n": call_count}} sorted by time."""
    with _LOCK:
        out = {k: {"s": round(_TOTALS[k], 4), "n": _COUNTS[k]}
               for k in sorted(_TOTALS, key=_TOTALS.get, reverse=True)}
        if reset:
            _TOTALS.clear()
            _COUNTS.clear()
    return out
