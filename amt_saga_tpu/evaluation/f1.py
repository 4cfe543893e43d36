"""Note-event F1 evaluator (SURVEY.md C15, layer L5).

mir_eval-style transcription scoring (mir_eval is not installed here —
SURVEY.md §7): a predicted note matches a reference note iff

* onset within ``onset_tol`` seconds (default 50 ms, SURVEY.md 3.3),
* exact pitch equality,
* optionally (``with_offset``) offset within
  ``max(offset_min_tol, offset_ratio * ref_duration)``,
* optionally (``with_instrument``) program equality (MusicNet setting),
* optionally (``with_velocity``) velocity within ``velocity_tol`` of the
  reference on the [0, 1] = velocity/127 scale.  (mir_eval's
  transcription_velocity additionally rescales predicted velocities to
  the reference by a global least-squares fit; velocities here live on
  the same absolute MIDI scale on both sides, so the direct tolerance is
  the faithful criterion.)

Matching is a maximum bipartite matching over the valid pairs (greedy
matching undercounts; mir_eval also uses maximum matching).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from scipy.sparse import csr_matrix
from scipy.sparse.csgraph import maximum_bipartite_matching

from ..core.notes import NoteSequence


@dataclass(frozen=True)
class F1Result:
    precision: float
    recall: float
    f1: float
    n_pred: int
    n_ref: int
    n_match: int


def note_f1(
    pred: NoteSequence,
    ref: NoteSequence,
    *,
    onset_tol: float = 0.05,
    with_offset: bool = False,
    offset_ratio: float = 0.2,
    offset_min_tol: float = 0.05,
    with_instrument: bool = False,
    with_velocity: bool = False,
    velocity_tol: float = 0.1,
) -> F1Result:
    pa = pred.to_arrays()
    ra = ref.to_arrays()
    n_p, n_r = len(pa["pitch"]), len(ra["pitch"])
    if n_p == 0 or n_r == 0:
        n_match = 0
    else:
        # Vectorized candidate-pair construction: broadcast only WITHIN
        # each (pitch[, program]) group — overall cost is
        # sum_k n_p(k)*n_r(k) in numpy, not n_p*n_r Python-loop
        # iterations (a full-length MAESTRO recording has thousands of
        # notes; the quadratic host loop was the evaluator's wall-time).
        p_key = pa["pitch"].astype(np.int64)
        r_key = ra["pitch"].astype(np.int64)
        if with_instrument:
            p_key = p_key + (pa["program"].astype(np.int64) << 32)
            r_key = r_key + (ra["program"].astype(np.int64) << 32)
        rows_l, cols_l = [], []
        for key in np.intersect1d(np.unique(p_key), np.unique(r_key)):
            pi = np.nonzero(p_key == key)[0]
            ri = np.nonzero(r_key == key)[0]
            ok = (np.abs(pa["onset"][pi, None] - ra["onset"][None, ri])
                  <= onset_tol)
            if with_offset:
                tol = np.maximum(offset_min_tol,
                                 offset_ratio * ra["duration"][ri])
                p_off = pa["onset"][pi] + pa["duration"][pi]
                r_off = ra["onset"][ri] + ra["duration"][ri]
                ok &= (np.abs(p_off[:, None] - r_off[None, :])
                       <= tol[None, :])
            if with_velocity:
                dv = np.abs(pa["velocity"][pi, None].astype(np.float64)
                            - ra["velocity"][None, ri]) / 127.0
                ok &= dv <= velocity_tol
            ii, jj = np.nonzero(ok)
            rows_l.append(pi[ii])
            cols_l.append(ri[jj])
        rows = np.concatenate(rows_l) if rows_l else np.array([], int)
        cols = np.concatenate(cols_l) if cols_l else np.array([], int)
        if len(rows) == 0:
            n_match = 0
        else:
            graph = csr_matrix(
                (np.ones(len(rows)), (rows, cols)), shape=(n_p, n_r))
            match = maximum_bipartite_matching(graph, perm_type="column")
            n_match = int(np.sum(match >= 0))

    precision = n_match / n_p if n_p else 0.0
    recall = n_match / n_r if n_r else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall > 0 else 0.0)
    return F1Result(precision, recall, f1, n_p, n_r, n_match)


def corpus_f1(pairs: list[tuple[NoteSequence, NoteSequence]],
              **kw) -> F1Result:
    """Micro-averaged F1 over (pred, ref) pairs."""
    tp = fp = fn = 0
    for pred, ref in pairs:
        r = note_f1(pred, ref, **kw)
        tp += r.n_match
        fp += r.n_pred - r.n_match
        fn += r.n_ref - r.n_match
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall > 0 else 0.0)
    return F1Result(precision, recall, f1, tp + fp, tp + fn, tp)
