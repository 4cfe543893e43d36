"""Dense-decoder (cnn_dense) fixture evaluation + threshold sweep.

The standalone bank-free mode (models/dense_decoder.py) has one real
knob pair: the emission threshold on P(onset)*P(presence) and the
training positive-class weight that calibrates those probabilities.
This harness computes the classifier's raw heads ONCE per clip (the
expensive forward) and re-decodes them at every swept threshold — the
decode is a trivial jitted program, so a full sweep costs one forward
pass per clip.

    python benchmarks/eval_dense.py --ckpt /tmp/dense_ckpt8 \
        --thresholds 0.3 0.5 0.7 0.8 0.9

Prints one JSON line per (suite, threshold) and a summary table; with
``--record`` appends the best-threshold row to benchmarks/history.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from amt_saga_tpu import default_config  # noqa: E402
from amt_saga_tpu.cli import _load_cnn_params
from amt_saga_tpu.evaluation.f1 import note_f1
from amt_saga_tpu.models.classifier import build_classifier
from amt_saga_tpu.models.dense_decoder import DenseTranscriber, decode_dense
from amt_saga_tpu.runtime.fixtures import make_clip

SUITES = [
    ("isol", dict(kind="isol", n_notes=8)),
    ("mus2", dict(kind="mus", n_voices=2)),
    ("mus3", dict(kind="mus", n_voices=3)),
    ("mus4", dict(kind="mus", n_voices=4)),
]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", help="checkpoint dir (default: CLI resolution "
                                  "order, i.e. the shipped checkpoint)")
    p.add_argument("--thresholds", type=float, nargs="+",
                   default=[0.3, 0.5, 0.7, 0.8, 0.9, 0.95])
    p.add_argument("--seeds", type=int, default=4)
    p.add_argument("--seconds", type=float, default=10.0)
    p.add_argument("--noise", type=float, default=0.0)
    p.add_argument("--record", action="store_true")
    args = p.parse_args()

    # Resolve checkpoints the way the cnn_dense CLI mode does (the
    # resolution order depends on run.classifier; without this the
    # harness silently loaded the GATE checkpoint and swept zeros).
    cfg = default_config().override(**{"run.classifier": "cnn_dense"})
    if args.ckpt:
        import os

        os.environ["AMT_CHECKPOINT"] = args.ckpt
    params = _load_cnn_params(cfg)
    model = build_classifier(cfg)

    from amt_saga_tpu.dsp.cqt import logf_spectrogram
    from amt_saga_tpu.dsp.stft import stft_magnitude
    import jax.numpy as jnp

    @jax.jit
    def heads_fn(wave):
        mag = stft_magnitude(wave, cfg.dsp)
        spec = logf_spectrogram(mag[None], cfg.dsp)
        return model.apply({"params": params}, spec)

    # One forward per clip; decode re-runs per threshold on cached heads.
    clips = []
    for name, kw in SUITES:
        for seed in range(args.seeds):
            wave, ref = make_clip(cfg, seconds=args.seconds, seed=seed,
                                  noise=args.noise, **kw)
            heads = jax.device_get(heads_fn(jnp.asarray(wave)))
            clips.append((name, heads, ref))

    tr = DenseTranscriber.__new__(DenseTranscriber)  # decode-only helper
    tr.cfg = cfg

    results: dict[float, dict[str, float]] = {}
    for thr in args.thresholds:
        per_suite: dict[str, list[float]] = {n: [] for n, _ in SUITES}
        for name, heads, ref in clips:
            arrs = jax.device_get(decode_dense(cfg, heads, threshold=thr))
            seq = tr._emit(arrs, 0)
            per_suite[name].append(note_f1(seq, ref).f1)
        row = {n: round(float(np.mean(v)), 4) for n, v in per_suite.items()}
        row["mean"] = round(float(np.mean(list(row.values()))), 4)
        results[thr] = row
        print(json.dumps({"threshold": thr, **row}), flush=True)

    best = max(results, key=lambda t: results[t]["mean"])
    summary = {"name": "dense_decoder_sweep", "ckpt": args.ckpt or "shipped",
               "noise": args.noise, "best_threshold": best,
               **results[best]}
    print(json.dumps({"best": summary}))
    if args.record:
        import subprocess

        git = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             capture_output=True, text=True).stdout.strip()
        with open("benchmarks/history.jsonl", "a") as f:
            f.write(json.dumps({"git": git, "results": [summary],
                                "ts": time.time()}) + "\n")


if __name__ == "__main__":
    main()
