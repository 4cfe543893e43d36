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
    # Timing must FETCH the result: on the axon backend block_until_ready
    # can return before an async-compiled program has executed (same
    # workaround as bench.py).
    t0 = time.time()
    jax.device_get(tr._fn(dev))
    compile_s = time.time() - t0
    times = []
    for _ in range(repeats):
        t0 = time.time()
        jax.device_get(tr._fn(dev))
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

    import numpy as np

    from amt_saga_tpu.core.notes import NoteSequence
    from amt_saga_tpu.runtime.fixtures import render_notes

    # Repeated-note etude (loud strikes + soft same-pitch re-strikes):
    # tracks the emission re-strike split (loop.restrike_split).
    spf_e = cfg.dsp.hop / cfg.dsp.sample_rate
    rng_e = np.random.default_rng(55)
    pairs = []
    for _s in range(8):
        ref = NoteSequence()
        t = 0.3
        while t < 9.0:
            pitch = int(rng_e.integers(40, 90))
            ref.add(round(t / spf_e) * spf_e, 0.28, pitch,
                    int(rng_e.integers(70, 116)), 0)
            t += float(rng_e.uniform(0.3, 0.7))
            for _ in range(int(rng_e.integers(1, 4))):
                if t >= 9.5:
                    break
                ref.add(round(t / spf_e) * spf_e, 0.25, pitch,
                        int(rng_e.integers(35, 81)), 0)
                t += float(rng_e.uniform(0.3, 0.7))
            t += 0.25
        wave = render_notes(ref.sorted(), cfg,
                            int(10.0 * cfg.dsp.sample_rate))
        pairs.append((tr.transcribe(wave), ref.sorted()))
    r = corpus_f1(pairs)
    out.append({"name": "f1_etude_restrike",
                "precision": round(r.precision, 4),
                "recall": round(r.recall, 4), "f1": round(r.f1, 4)})

    # Off-grid durations under the onset+offset criterion: tracks the
    # continuous duration fit (synth.templates.DurationRefiner).

    rng = np.random.default_rng(77)
    spf = cfg.dsp.hop / cfg.dsp.sample_rate
    pairs = []
    for _s in range(4):
        ref = NoteSequence()
        frame = 10
        for _ in range(8):
            dur = float(rng.uniform(0.17, 1.8))
            pitch = int(rng.integers(cfg.synth.pitch_min + 8,
                                     cfg.synth.pitch_max - 8))
            ref.add(frame * spf, dur, pitch, 96, 0)
            frame += int(rng.integers(28, 40))
        wave = render_notes(ref.sorted(),
                            cfg, int(10.0 * cfg.dsp.sample_rate))
        pairs.append((tr.transcribe(wave), ref.sorted()))
    r = corpus_f1(pairs, with_offset=True)
    out.append({"name": "f1_offgrid_offset",
                "precision": round(r.precision, 4),
                "recall": round(r.recall, 4), "f1": round(r.f1, 4)})

    # Velocity MAE on 3-voice polyphony: tracks the joint gain refit
    # (LoopConfig.refit_gains).
    clips = make_corpus(cfg, kind="mus", n_clips=4, seconds=10.0,
                        seed=4321, n_voices=3)
    errs = []
    for w, ref in clips:
        pred = tr.transcribe(w)
        for rn in ref:
            hits = [pn for pn in pred if pn.pitch == rn.pitch
                    and abs(pn.onset - rn.onset) <= 0.05]
            if hits:
                best = min(hits, key=lambda pn: abs(pn.onset - rn.onset))
                errs.append(abs(best.velocity - rn.velocity))
    out.append({"name": "vel_mae_mus3",
                "mae": round(float(np.mean(errs)), 2) if errs else None,
                "n_matched": len(errs)})
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
