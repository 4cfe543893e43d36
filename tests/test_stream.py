"""Chunked streaming transcription tests (SURVEY.md 3.5, BASELINE config 4).

Uses the 8 virtual CPU devices conftest provides; the MAESTRO stand-in is
a long "mus"/"isol" fixture.
"""

import numpy as np
import pytest

from amt_saga_tpu.core.notes import NoteSequence
from amt_saga_tpu.evaluation.f1 import note_f1
from amt_saga_tpu.runtime.fixtures import make_clip
from amt_saga_tpu.stream.chunk import (
    chunk_plan,
    make_chunks,
    stitch,
    transcribe_long,
)


@pytest.fixture(scope="module")
def stream_config(tiny_config):
    return tiny_config.override(**{
        "stream.chunk_seconds": 6.0,
        "stream.overlap_seconds": 1.5,
        "run.batch_size": 4,
    })


def test_chunk_plan_covers_waveform(stream_config):
    cfg = stream_config
    sr = cfg.dsp.sample_rate
    n = int(20.5 * sr)
    plan = chunk_plan(n, cfg)
    chunk = plan[0][1]
    step = plan[1][0] - plan[0][0]
    assert chunk % cfg.dsp.hop == 0 and step % cfg.dsp.hop == 0
    assert plan[0][0] == 0
    assert plan[-1][0] + chunk >= n  # tail covered (zero-padded)
    overlap = chunk - step
    assert overlap >= int(cfg.stream.overlap_seconds * sr) - cfg.dsp.hop


def test_short_waveform_single_chunk(stream_config):
    cfg = stream_config
    n = cfg.dsp.sample_rate  # 1s << chunk
    chunks, starts = make_chunks(np.zeros(n, np.float32), cfg)
    assert chunks.shape[0] == 1 and starts == [0]


def test_stitch_dedupes_overlap(stream_config):
    cfg = stream_config
    sr = cfg.dsp.sample_rate
    chunk = int(6.0 * sr) // cfg.dsp.hop * cfg.dsp.hop
    step = chunk - int(1.5 * sr) // cfg.dsp.hop * cfg.dsp.hop
    # A note at absolute t=5.0s lies in the overlap of chunks 0 and 1.
    t_abs = 5.0
    seq0 = NoteSequence()
    seq0.add(t_abs, 0.5, 60, 90, 0)  # chunk 0 local == absolute
    seq1 = NoteSequence()
    seq1.add(t_abs - step / sr, 0.5, 60, 90, 0)
    merged = stitch([seq0, seq1], [0, step], cfg)
    assert len(merged) == 1
    assert abs(merged.notes[0].onset - t_abs) < 1e-6


def test_stitch_keeps_distinct_notes(stream_config):
    cfg = stream_config
    seq0 = NoteSequence()
    seq0.add(1.0, 0.5, 60, 90, 0)
    seq0.add(1.0, 0.5, 64, 90, 0)  # same onset, different pitch
    seq1 = NoteSequence()
    seq1.add(2.0, 0.5, 60, 90, 0)  # same pitch, far onset
    merged = stitch([seq0, seq1], [0, 0], cfg)
    assert len(merged) == 3


def test_stitch_keeps_same_chunk_fast_repeats(stream_config):
    # Two genuine fast repeats of the same pitch WITHIN one chunk sit
    # inside onset_tol of each other; only cross-chunk pairs are stitching
    # duplicates, so both must survive.
    cfg = stream_config
    sr = cfg.dsp.sample_rate
    tol = 2.5 * cfg.dsp.hop / sr
    seq0 = NoteSequence()
    seq0.add(1.0, 0.3, 60, 90, 0)
    seq0.add(1.0 + 0.5 * tol, 0.3, 60, 90, 0)  # same chunk, within tol
    merged = stitch([seq0], [0], cfg)
    assert len(merged) == 2


def test_transcribe_long_end_to_end(stream_config, tiny_transcriber):
    cfg = stream_config
    # NB: tiny_transcriber was built with tiny_config; stream fields do not
    # affect the compiled program, only the host-side chunking.
    wave, ref = make_clip(cfg, kind="isol", seconds=20.0, n_notes=12,
                          seed=5)
    pred = transcribe_long(wave, tiny_transcriber, cfg)
    r = note_f1(pred, ref)
    assert r.f1 == 1.0, (r, pred.to_arrays(), ref.to_arrays())


def test_transcribe_long_matches_direct_on_polyphonic(stream_config,
                                                      tiny_transcriber):
    cfg = stream_config
    wave, ref = make_clip(cfg, kind="long", seconds=18.0, n_voices=2,
                          seed=6)
    pred = transcribe_long(wave, tiny_transcriber, cfg)
    r = note_f1(pred, ref)
    assert r.f1 >= 0.8, r


def test_transcribe_long_with_pallas(stream_config):
    from amt_saga_tpu.saga.loop import Transcriber

    cfg = stream_config.override(**{"run.use_pallas": True})
    wave, ref = make_clip(cfg, kind="isol", seconds=14.0, n_notes=8,
                          seed=9)
    pred = transcribe_long(wave, Transcriber(cfg), cfg)
    assert note_f1(pred, ref).f1 == 1.0
