#!/usr/bin/env python
"""Classifier-mode comparison (VERDICT r1 #2 acceptance harness).

    python benchmarks/eval_classifier.py [--ckpt DIR] [--floor F]
        [--clips N] [--voices V] [--noises 0.0,0.03]

For each classifier mode (heuristic, cnn) and each noise level, makes a
fixed synthetic 3-voice MUS corpus, transcribes it batched on the
available chip, and reports micro-averaged note F1.  One JSON line.

The acceptance bar (BASELINE.md): cnn >= heuristic on clean data while
keeping its edge at noise 0.03.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=os.path.join(REPO, "checkpoints",
                                                   "default"))
    ap.add_argument("--floor", type=float, default=None,
                    help="override model.gate_floor")
    ap.add_argument("--clips", type=int, default=6)
    ap.add_argument("--voices", type=int, default=3)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--noises", default="0.0,0.03")
    args = ap.parse_args()

    import glob

    import numpy as np

    from amt_saga_tpu import default_config
    from amt_saga_tpu.evaluation.f1 import corpus_f1
    from amt_saga_tpu.models.classifier import make_cnn_score_fn
    from amt_saga_tpu.models.train import load_checkpoint
    from amt_saga_tpu.runtime.fixtures import make_corpus
    from amt_saga_tpu.saga.loop import Transcriber

    cfg = default_config()
    if args.floor is not None:
        cfg = cfg.override(**{"model.gate_floor": args.floor})
    noises = [float(x) for x in args.noises.split(",")]

    steps = sorted(glob.glob(os.path.join(args.ckpt, "step_*")),
                   key=lambda p: int(os.path.basename(p).rsplit("_", 1)[1]))
    if not steps:
        raise SystemExit(f"no checkpoint under {args.ckpt}")
    params = load_checkpoint(cfg, steps[-1])

    cfg_static = cfg.override(**{"run.cnn_gate": "static"})
    transcribers = {
        "heuristic": Transcriber(cfg),
        "cnn": Transcriber(cfg, score_fn=make_cnn_score_fn(cfg, params)),
        # Static gate (run.cnn_gate="static"): conv tower once per batch
        # on the pristine spectrogram instead of per loop iteration.
        "cnn_static": Transcriber(
            cfg_static, score_fn=make_cnn_score_fn(cfg_static, params)),
    }

    out = {"ckpt": steps[-1], "floor": cfg.model.gate_floor,
           "voices": args.voices, "clips": args.clips}
    for noise in noises:
        pairs_by_mode = {m: [] for m in transcribers}
        clips = make_corpus(cfg, kind="mus", n_clips=args.clips,
                            seconds=args.seconds, n_voices=args.voices,
                            seed=100, noise=noise)
        waves = np.stack([w for w, _ in clips])
        refs = [r for _, r in clips]
        for mode, tr in transcribers.items():
            preds = tr.transcribe_batch(waves)
            pairs_by_mode[mode] = list(zip(preds, refs))
        for mode in transcribers:
            r = corpus_f1(pairs_by_mode[mode])
            key = f"{mode}_n{noise:g}"
            out[key] = round(r.f1, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
