"""Structured metrics + logging (SURVEY.md §5 observability).

The reference logs with prints/matplotlib; here every stage emits
structured JSONL records (clips/s, audio-sec/s/chip, loop iterations,
residual-energy, F1, train loss) plus a human-readable log line.
"""

from __future__ import annotations

import json
import logging
import sys
import time
from typing import Any, IO


def get_logger(name: str) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s %(message)s"))
        logger.addHandler(h)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    return logger


class MetricsWriter:
    """Append-only JSONL metrics sink (stdout, stderr, or a file)."""

    def __init__(self, path: str | None = None, stream: IO | None = None):
        self._own = False
        if path is not None:
            self._fh = open(path, "a")
            self._own = True
        else:
            self._fh = stream if stream is not None else sys.stderr

    def write(self, record: dict[str, Any], **extra: Any) -> None:
        rec = {"ts": time.time(), **record, **extra}
        self._fh.write(json.dumps(rec, sort_keys=True) + "\n")
        self._fh.flush()

    def close(self) -> None:
        if self._own:
            self._fh.close()
