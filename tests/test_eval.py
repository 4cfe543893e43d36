"""Evaluator tests vs hand-computed cases (SURVEY.md §4.2, C15)."""

from amt_saga_tpu.core.notes import NoteSequence
from amt_saga_tpu.evaluation.f1 import corpus_f1, note_f1


def _seq(notes):
    s = NoteSequence()
    for n in notes:
        s.add(*n)
    return s


def test_perfect_match():
    ref = _seq([(0.0, 0.5, 60), (1.0, 0.5, 64)])
    r = note_f1(ref, ref)
    assert r.f1 == 1.0 and r.n_match == 2


def test_onset_tolerance():
    ref = _seq([(1.0, 0.5, 60)])
    pred_ok = _seq([(1.04, 0.5, 60)])
    pred_bad = _seq([(1.06, 0.5, 60)])
    assert note_f1(pred_ok, ref).f1 == 1.0
    assert note_f1(pred_bad, ref).f1 == 0.0


def test_pitch_must_match():
    ref = _seq([(1.0, 0.5, 60)])
    pred = _seq([(1.0, 0.5, 61)])
    assert note_f1(pred, ref).f1 == 0.0


def test_precision_recall_asymmetry():
    ref = _seq([(0.0, 0.5, 60), (1.0, 0.5, 64)])
    pred = _seq([(0.0, 0.5, 60)])
    r = note_f1(pred, ref)
    assert r.precision == 1.0 and r.recall == 0.5


def test_double_counting_prevented():
    # Two predictions near one reference note: only one may match.
    ref = _seq([(1.0, 0.5, 60)])
    pred = _seq([(0.99, 0.5, 60), (1.01, 0.5, 60)])
    r = note_f1(pred, ref)
    assert r.n_match == 1 and r.precision == 0.5


def test_maximum_matching_beats_greedy():
    # Greedy nearest-first would match pred0<->ref0 and strand pred1;
    # maximum matching pairs pred0<->ref1, pred1<->ref0.
    ref = _seq([(1.00, 0.5, 60), (1.04, 0.5, 60)])
    pred = _seq([(1.04, 0.5, 60), (0.99, 0.5, 60)])
    r = note_f1(pred, ref)
    assert r.n_match == 2


def test_offset_criterion():
    ref = _seq([(0.0, 1.0, 60)])
    pred = _seq([(0.0, 0.5, 60)])
    assert note_f1(pred, ref, with_offset=False).f1 == 1.0
    assert note_f1(pred, ref, with_offset=True).f1 == 0.0


def test_instrument_criterion():
    ref = _seq([(0.0, 1.0, 60, 90, 3)])
    pred = _seq([(0.0, 1.0, 60, 90, 0)])
    assert note_f1(pred, ref, with_instrument=False).f1 == 1.0
    assert note_f1(pred, ref, with_instrument=True).f1 == 0.0


def test_corpus_micro_average():
    ref = _seq([(0.0, 0.5, 60), (1.0, 0.5, 64)])
    pred_half = _seq([(0.0, 0.5, 60)])
    r = corpus_f1([(pred_half, ref), (ref, ref)])
    assert r.n_match == 3 and r.n_ref == 4 and r.n_pred == 3


def test_velocity_criterion():
    ref = _seq([(0.0, 1.0, 60, 90)])
    within = _seq([(0.0, 1.0, 60, 80)])    # |90-80|/127 = 0.079 <= 0.1
    outside = _seq([(0.0, 1.0, 60, 70)])   # |90-70|/127 = 0.157 > 0.1
    assert note_f1(within, ref, with_velocity=False).f1 == 1.0
    assert note_f1(within, ref, with_velocity=True).f1 == 1.0
    assert note_f1(outside, ref, with_velocity=True).f1 == 0.0
    assert note_f1(outside, ref, with_velocity=True,
                   velocity_tol=0.2).f1 == 1.0
