#!/usr/bin/env python
"""Golden-path quality sweep over the pinned fixture suites.

    python benchmarks/quality_sweep.py --suites mus4,mus8 --seeds 1234 \
        --set loop.stop_patience=2 --set loop.min_score_rel0=1e-4

The golden CPU oracle is decision-identical to the TPU path (the parity
contract pinned by tests/test_saga_loop.py), so config/quality
experiments sweep here without chip time; the ad-hoc scripts previous
rounds re-wrote live in this harness now.  One JSON line per
(suite, seed) with P/R/F1 and per-clip F1s; a trailing summary line
averages each suite over seeds.

Suites (all 10 s clips, default 4 per seed):
  isol     8 isolated notes (MAPS-ISOL stand-in)
  mus2/3/4/6/8   N-voice polyphony (MAPS-MUS stand-in)
  etude    repeated-note strikes with soft same-pitch re-strikes
           (tracks loop.restrike_split; generator mirrors
           benchmarks/run_benchmarks.py)
  offgrid  off-grid durations scored with the offset criterion
           (tracks synth.templates.DurationRefiner)
  multi5   2-instrument MusicNet stand-in scored with the instrument
           criterion (BASELINE config 5)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_etude_pairs(cfg, seed: int, n_clips: int):
    import numpy as np

    from amt_saga_tpu.core.notes import NoteSequence
    from amt_saga_tpu.runtime.fixtures import render_notes

    spf = cfg.dsp.hop / cfg.dsp.sample_rate
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_clips):
        ref = NoteSequence()
        t = 0.3
        while t < 9.0:
            pitch = int(rng.integers(40, 90))
            ref.add(round(t / spf) * spf, 0.28, pitch,
                    int(rng.integers(70, 116)), 0)
            t += float(rng.uniform(0.3, 0.7))
            for _ in range(int(rng.integers(1, 4))):
                if t >= 9.5:
                    break
                ref.add(round(t / spf) * spf, 0.25, pitch,
                        int(rng.integers(35, 81)), 0)
                t += float(rng.uniform(0.3, 0.7))
            t += 0.25
        wave = render_notes(ref.sorted(), cfg,
                            int(10.0 * cfg.dsp.sample_rate))
        out.append((wave, ref.sorted()))
    return out


def make_offgrid_pairs(cfg, seed: int, n_clips: int):
    import numpy as np

    from amt_saga_tpu.core.notes import NoteSequence
    from amt_saga_tpu.runtime.fixtures import render_notes

    rng = np.random.default_rng(seed)
    spf = cfg.dsp.hop / cfg.dsp.sample_rate
    out = []
    for _ in range(n_clips):
        ref = NoteSequence()
        frame = 10
        for _ in range(8):
            dur = float(rng.uniform(0.17, 1.8))
            pitch = int(rng.integers(cfg.synth.pitch_min + 8,
                                     cfg.synth.pitch_max - 8))
            ref.add(frame * spf, dur, pitch, 96, 0)
            frame += int(rng.integers(28, 40))
        wave = render_notes(ref.sorted(), cfg,
                            int(10.0 * cfg.dsp.sample_rate))
        out.append((wave, ref.sorted()))
    return out


def suite_pairs(name: str, cfg, seed: int, n_clips: int):
    from amt_saga_tpu.runtime.fixtures import make_corpus

    if name == "isol":
        return make_corpus(cfg, kind="isol", n_clips=n_clips,
                           seconds=10.0, seed=seed, n_notes=8)
    if name.startswith("mus"):
        return make_corpus(cfg, kind="mus", n_clips=n_clips, seconds=10.0,
                           seed=seed, n_voices=int(name[3:]))
    if name == "etude":
        return make_etude_pairs(cfg, seed, n_clips)
    if name == "offgrid":
        return make_offgrid_pairs(cfg, seed, n_clips)
    if name == "multi5":
        return make_corpus(cfg, kind="multi", n_clips=n_clips,
                           seconds=10.0, seed=seed, n_voices=3,
                           programs=(0, 1, 2))
    raise SystemExit(f"unknown suite {name!r}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suites", default="mus4,mus6,mus8,etude")
    ap.add_argument("--seeds", default="1234")
    ap.add_argument("--clips", type=int, default=4)
    ap.add_argument("--set", action="append", default=[],
                    metavar="KEY=VAL", help="config override (repeat)")
    ap.add_argument("--noise", type=float, default=0.0,
                    help="additive white noise on every suite's waves")
    ap.add_argument("--tag", default="", help="echoed in every record")
    ap.add_argument("--gate", default="",
                    help="path to a fresh-seed pins JSON "
                         "(benchmarks/fresh_pins.json): run each pinned "
                         "suite on its pinned NEVER-TUNED seeds and exit "
                         "1 if any suite mean falls below pin - "
                         "tolerance.  Overrides --suites/--seeds.")
    args = ap.parse_args()

    import numpy as np

    from amt_saga_tpu import default_config
    from amt_saga_tpu.cli import _parse_value
    from amt_saga_tpu.evaluation.f1 import corpus_f1, note_f1
    from amt_saga_tpu.golden.pipeline import transcribe_golden

    overrides = {}
    for kv in args.set:
        k, v = kv.split("=", 1)
        overrides[k] = _parse_value(v)
    pins = None
    if args.gate:
        with open(args.gate) as f:
            pins = json.load(f)
        args.suites = ",".join(pins["suites"].keys())
        args.seeds = ",".join(str(s) for s in pins["seeds"])
        args.clips = int(pins.get("clips", args.clips))
    cfg = default_config()
    if any(s == "multi5" for s in args.suites.split(",")):
        # BASELINE config 5's multi-instrument configuration (the
        # nyquist-spanning filterbank — see benchmarks/run_configs.py).
        cfg = cfg.override(**{
            "synth.n_instruments": 3,
            "synth.instrument_rolloffs": [0.5, 1.25, 2.5],
            "dsp.n_bins": 294,
        })
    if overrides:
        cfg = cfg.override(**overrides)

    by_suite = defaultdict(list)
    for suite in args.suites.split(","):
        for seed in (int(s) for s in args.seeds.split(",")):
            pairs = suite_pairs(suite, cfg, seed, args.clips)
            if args.noise > 0:
                rng = np.random.default_rng(seed + 999_001)
                pairs = [(w + args.noise * rng.standard_normal(
                    len(w)).astype(np.float32), r) for w, r in pairs]
            scored = []
            per_clip = []
            for w, ref in pairs:
                pred = transcribe_golden(w, cfg).sequence
                scored.append((pred, ref))
                per_clip.append(round(note_f1(
                    pred, ref,
                    with_offset=(suite == "offgrid"),
                    with_instrument=(suite == "multi5")).f1, 4))
            r = corpus_f1(scored, with_offset=(suite == "offgrid"),
                          with_instrument=(suite == "multi5"))
            rec = {"suite": suite, "seed": seed,
                   "precision": round(r.precision, 4),
                   "recall": round(r.recall, 4), "f1": round(r.f1, 4),
                   "per_clip": per_clip}
            if args.tag:
                rec["tag"] = args.tag
            if overrides:
                rec["overrides"] = {k: str(v) for k, v in overrides.items()}
            print(json.dumps(rec), flush=True)
            by_suite[suite].append(r.f1)
    summary = {s: round(float(np.mean(v)), 4) for s, v in by_suite.items()}
    print(json.dumps({"summary": summary, "noise": args.noise,
                      "tag": args.tag}), flush=True)
    if pins is not None:
        # Fresh-seed regression gate (round-3 verdict item 2): the
        # pinned means were measured on seeds NEVER used for tuning, so
        # a regression here is generalization loss the tracked-seed
        # pins cannot see.  Tolerance absorbs fixture variance
        # (measured cross-seed std — see fresh_pins.json provenance).
        failures = []
        for suite, pin in pins["suites"].items():
            got = summary.get(suite)
            floor = pin["mean_f1"] - pin.get(
                "tolerance", pins.get("tolerance", 0.015))
            if got is None or got < floor:
                failures.append({"suite": suite, "mean_f1": got,
                                 "pin": pin["mean_f1"],
                                 "floor": round(floor, 4)})
        print(json.dumps({"gate": "fresh_seed",
                          "ok": not failures,
                          "failures": failures}), flush=True)
        if failures:
            raise SystemExit(1)


if __name__ == "__main__":
    main()
