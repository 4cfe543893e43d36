#!/usr/bin/env python
"""Benchmark suite with regression history (SURVEY.md §4.6).

Runs the throughput benchmarks across the pinned workload matrix
(BASELINE.json configs) plus the quality suite, appends one JSONL record
per run to ``benchmarks/history.jsonl``, and prints a summary table.

    python benchmarks/run_benchmarks.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
HISTORY = os.path.join(REPO, "benchmarks", "history.jsonl")


def bench_throughput(batch: int, seconds: float, repeats: int,
                     use_pallas: bool) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from amt_saga_tpu import default_config
    from amt_saga_tpu.runtime.fixtures import make_clip
    from amt_saga_tpu.saga.loop import Transcriber

    cfg = default_config().override(**{"run.use_pallas": use_pallas})
    waves = np.stack([
        make_clip(cfg, kind="isol" if i % 2 == 0 else "mus",
                  seconds=seconds, n_notes=8, n_voices=3, seed=i)[0]
        for i in range(batch)])
    tr = Transcriber(cfg)
    dev = jax.device_put(jnp.asarray(waves))
    t0 = time.time()
    jax.block_until_ready(tr._fn(dev))
    compile_s = time.time() - t0
    times = []
    for _ in range(repeats):
        t0 = time.time()
        jax.block_until_ready(tr._fn(dev))
        times.append(time.time() - t0)
    wall = statistics.median(times)
    return {
        "name": f"throughput_b{batch}_{'pallas' if use_pallas else 'xla'}",
        "audio_sec_per_sec": round(batch * seconds / wall, 1),
        "median_wall_s": round(wall, 4),
        "compile_s": round(compile_s, 1),
    }


def bench_quality() -> list[dict]:
    from amt_saga_tpu import default_config
    from amt_saga_tpu.evaluation.f1 import corpus_f1
    from amt_saga_tpu.runtime.fixtures import make_corpus
    from amt_saga_tpu.saga.loop import Transcriber

    cfg = default_config()
    tr = Transcriber(cfg)
    out = []
    for kind, kw in [("isol", dict(n_notes=8)),
                     ("mus", dict(n_voices=2)),
                     ("mus", dict(n_voices=4))]:
        clips = make_corpus(cfg, kind=kind, n_clips=4, seconds=10.0,
                            seed=1234, **kw)
        pairs = [(tr.transcribe(w), ref) for w, ref in clips]
        r = corpus_f1(pairs)
        out.append({
            "name": f"f1_{kind}_{list(kw.values())[0]}",
            "precision": round(r.precision, 4),
            "recall": round(r.recall, 4),
            "f1": round(r.f1, 4),
        })
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    git_rev = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
        capture_output=True, text=True).stdout.strip()

    results = []
    matrix = [(32, True)] if args.quick else [(32, True), (32, False),
                                              (128, True)]
    for batch, pallas in matrix:
        results.append(bench_throughput(batch, 10.0, 3, pallas))
    results.extend(bench_quality())

    rec = {"ts": time.time(), "git": git_rev, "results": results}
    os.makedirs(os.path.dirname(HISTORY), exist_ok=True)
    with open(HISTORY, "a") as f:
        f.write(json.dumps(rec, sort_keys=True) + "\n")

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
