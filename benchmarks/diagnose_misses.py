#!/usr/bin/env python
"""FN/FP taxonomy for the dense-polyphony suites (golden path).

    python benchmarks/diagnose_misses.py --suite mus8 --seeds 1234

For every false negative, classify the failure mode against the
prediction set:

  swallow   a same-pitch prediction's extent covers the missed onset
            (the greedy loop explained this strike with a longer or
            earlier note) — the re-strike-split / onset-snap territory
  offset    a same-pitch prediction onsets within +-6 frames but outside
            the 50 ms tolerance (early/late onset placement)
  masked    a SIMULTANEOUS (+-3 frames) prediction exists at a harmonic
            interval (+-12/19/24) with >= 2x the gain — energy eaten by
            a harmonically-related stronger voice
  absent    nothing of the same pitch anywhere within one template
            extent — the note was never extracted at all

and for every false positive: whether it is harmonically related to a
simultaneous true note (phantom), a duplicate of a matched ref
(dup/twin), or unexplained junk.  One JSON line per (suite, seed) plus
per-note detail with --verbose.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", default="mus8")
    ap.add_argument("--seeds", default="1234")
    ap.add_argument("--clips", type=int, default=4)
    ap.add_argument("--set", action="append", default=[],
                    metavar="KEY=VAL")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    import numpy as np
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import maximum_bipartite_matching

    from amt_saga_tpu import default_config
    from amt_saga_tpu.cli import _parse_value
    from amt_saga_tpu.golden.pipeline import transcribe_golden
    from benchmarks.quality_sweep import suite_pairs

    def match_pairs(pred, ref, onset_tol=0.05):
        """(pred_idx, ref_idx) matched pairs under the default onset+
        pitch+program criterion — the same candidate graph + maximum
        bipartite matching evaluation.f1.note_f1 scores with."""
        pn, rn = pred.notes, ref.notes
        rows, cols = [], []
        for i, p in enumerate(pn):
            for j, r in enumerate(rn):
                if (p.pitch == r.pitch and p.program == r.program
                        and abs(p.onset - r.onset) <= onset_tol):
                    rows.append(i)
                    cols.append(j)
        if not rows:
            return []
        graph = csr_matrix((np.ones(len(rows)), (rows, cols)),
                           shape=(len(pn), len(rn)))
        match = maximum_bipartite_matching(graph, perm_type="column")
        return [(i, int(match[i])) for i in range(len(pn))
                if match[i] >= 0]

    overrides = {}
    for kv in args.set:
        k, v = kv.split("=", 1)
        overrides[k] = _parse_value(v)
    cfg = default_config()
    if overrides:
        cfg = cfg.override(**overrides)
    spf = cfg.dsp.hop / cfg.dsp.sample_rate
    tmax_s = cfg.synth.template_frames * spf

    fn_modes = Counter()
    fp_modes = Counter()
    details = []
    n_fn = n_fp = n_match = 0
    for seed in (int(s) for s in args.seeds.split(",")):
        pairs = suite_pairs(args.suite, cfg, seed, args.clips)
        for ci, (w, ref) in enumerate(pairs):
            pred = transcribe_golden(w, cfg).sequence.sorted()
            ref = ref.sorted()
            m = match_pairs(pred, ref)
            matched_p = {i for i, _ in m}
            matched_r = {j for _, j in m}
            pn, rn = pred.notes, ref.notes
            n_match += len(m)
            for j, r in enumerate(rn):
                if j in matched_r:
                    continue
                n_fn += 1
                mode, info = "absent", ""
                # swallow: same-pitch pred covering this onset
                for i, p in enumerate(pn):
                    if p.pitch != r.pitch or p.program != r.program:
                        continue
                    if p.onset - 0.02 <= r.onset <= p.onset + p.duration:
                        mode = "swallow"
                        info = (f"covered by pred onset={p.onset:.2f} "
                                f"dur={p.duration:.2f} vel={p.velocity}")
                        break
                    if abs(p.onset - r.onset) <= 6 * spf and i not in \
                            matched_p:
                        mode = "offset"
                        info = (f"same-pitch pred at {p.onset:.2f} "
                                f"(ref {r.onset:.2f})")
                if mode == "absent":
                    # masked: harmonically-related stronger simultaneous
                    # TRUE neighbor (extraction-hard content) vs quiet?
                    for r2 in rn:
                        if r2 is r or abs(r2.onset - r.onset) > 3 * spf:
                            continue
                        if abs(r2.pitch - r.pitch) in (12, 19, 24) \
                                and r2.velocity >= 2 * r.velocity:
                            mode = "masked"
                            info = (f"harmonic neighbor p={r2.pitch} "
                                    f"vel={r2.velocity} vs {r.velocity}")
                            break
                fn_modes[mode] += 1
                details.append({"clip": f"{seed}/{ci}", "kind": "FN",
                                "mode": mode, "pitch": r.pitch,
                                "onset": round(r.onset, 3),
                                "vel": r.velocity, "info": info})
            for i, p in enumerate(pn):
                if i in matched_p:
                    continue
                n_fp += 1
                mode, info = "junk", ""
                for r in rn:
                    if abs(r.onset - p.onset) <= 3 * spf and \
                            (p.pitch - r.pitch) in (12, 19, 24) and \
                            r.program == p.program:
                        mode = "phantom"
                        info = f"harmonic of ref p={r.pitch}"
                        break
                    if r.pitch == p.pitch and r.program == p.program \
                            and abs(r.onset - p.onset) <= tmax_s:
                        mode = "dup"
                        info = f"near ref onset {r.onset:.2f}"
                        break
                fp_modes[mode] += 1
                details.append({"clip": f"{seed}/{ci}", "kind": "FP",
                                "mode": mode, "pitch": p.pitch,
                                "onset": round(p.onset, 3),
                                "vel": p.velocity, "info": info})

    rec = {"suite": args.suite, "matched": n_match, "fn": n_fn,
           "fp": n_fp, "fn_modes": dict(fn_modes),
           "fp_modes": dict(fp_modes)}
    if overrides:
        rec["overrides"] = {k: str(v) for k, v in overrides.items()}
    print(json.dumps(rec))
    if args.verbose:
        for d in details:
            print(json.dumps(d))


if __name__ == "__main__":
    main()
