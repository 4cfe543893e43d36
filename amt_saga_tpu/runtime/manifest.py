"""Corpus-run manifest: resumable batch transcription (SURVEY.md §5).

The reference has no failure handling; here corpus runs are resumable at
clip granularity: every completed clip appends a JSONL record, and a
restarted run skips clips already marked done.  This is the TPU-native
analogue of elastic recovery for an embarrassingly-parallel inference
workload — no multi-host coordination needed for the v4-8 north star.
"""

from __future__ import annotations

import json
import os
from typing import Any


class Manifest:
    def __init__(self, path: str):
        self.path = path
        self._done: dict[str, dict[str, Any]] = {}
        if os.path.exists(path):
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    rec = json.loads(line)
                    if rec.get("status") == "done":
                        self._done[rec["clip"]] = rec

    def is_done(self, clip: str, verify_output: bool = False) -> bool:
        """``verify_output=True`` additionally requires the recorded
        output file to still exist: a clip whose MIDI was deleted (or
        lost with its volume) between runs is re-queued instead of
        silently skipped — failure recovery must survive divergence
        between the manifest and the artifacts it describes, not just
        clean crashes (mark_done already orders write-then-mark for
        those)."""
        rec = self._done.get(clip)
        if rec is None:
            return False
        if verify_output:
            out = rec.get("output")
            if out and not os.path.exists(out):
                return False
        return True

    def done_keys(self) -> list[str]:
        """Clips marked done, in insertion order."""
        return list(self._done)

    def mark_done(self, clip: str, **extra: Any) -> None:
        rec = {"clip": clip, "status": "done", **extra}
        self._done[clip] = rec
        with open(self.path, "a") as f:
            f.write(json.dumps(rec, sort_keys=True) + "\n")

    @property
    def n_done(self) -> int:
        return len(self._done)
