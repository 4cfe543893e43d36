"""Tracing / profiling helpers (SURVEY.md §5).

The reference has ad-hoc timing prints; here the CLI's ``--profile`` flag
wraps work in ``jax.profiler.trace`` (Perfetto/TensorBoard-compatible) and
loop phases carry ``jax.named_scope`` annotations.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

from .logging import get_logger

log = get_logger(__name__)


@contextlib.contextmanager
def maybe_profile(enabled: bool, trace_dir: str = "/tmp/amt_profile"
                  ) -> Iterator[None]:
    if not enabled:
        yield
        return
    import jax

    log.info("profiling to %s (open with TensorBoard or Perfetto)",
             trace_dir)
    with jax.profiler.trace(trace_dir):
        yield
    log.info("profile written to %s", trace_dir)


@contextlib.contextmanager
def timed(label: str, sink=None) -> Iterator[None]:
    t0 = time.time()
    yield
    dt = time.time() - t0
    log.info("%s: %.3fs", label, dt)
    if sink is not None:
        sink.write({"event": "timing", "label": label, "seconds": dt})
