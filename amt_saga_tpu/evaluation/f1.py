"""Note-event F1 evaluator (SURVEY.md C15, layer L5).

mir_eval-style transcription scoring (mir_eval is not installed here —
SURVEY.md §7): a predicted note matches a reference note iff

* onset within ``onset_tol`` seconds (default 50 ms, SURVEY.md 3.3),
* exact pitch equality,
* optionally (``with_offset``) offset within
  ``max(offset_min_tol, offset_ratio * ref_duration)``,
* optionally (``with_instrument``) program equality (MusicNet setting).

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
) -> F1Result:
    p = pred.sorted().notes
    r = ref.sorted().notes
    n_p, n_r = len(p), len(r)
    if n_p == 0 or n_r == 0:
        n_match = 0
    else:
        rows, cols = [], []
        for i, pn in enumerate(p):
            for j, rn in enumerate(r):
                if pn.pitch != rn.pitch:
                    continue
                if abs(pn.onset - rn.onset) > onset_tol:
                    continue
                if with_instrument and pn.program != rn.program:
                    continue
                if with_offset:
                    tol = max(offset_min_tol, offset_ratio * rn.duration)
                    if abs(pn.offset - rn.offset) > tol:
                        continue
                rows.append(i)
                cols.append(j)
        if not rows:
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
