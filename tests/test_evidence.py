"""Device emission-evidence pass (saga/evidence.py): the chain's trace
extraction + vectorizable gating on the accelerator, sequential
decisions replayed on the host (VERDICT r3 item 1 — no reference
file:line possible, empty mount; SURVEY.md C9/L3 emission stage).

Pinned here: device region traces measure the same quantity as the
host's f64 filterbank dots; end-to-end MIDI equality vs the pure-host
chain on mixed fixtures (the f32-trace deviation class must not flip
decisions on clean content); the mutating-stage fallback reproducing
the host chain bit-for-bit on a lane where the onset snap fires; the
dedup inline replay matching dedup_twins' exact keep set."""

import numpy as np
import pytest

import jax.numpy as jnp

from amt_saga_tpu import default_config
from amt_saga_tpu.core.midi import notes_to_midi_bytes
from amt_saga_tpu.core.notes import NoteSequence
from amt_saga_tpu.runtime.fixtures import make_clip
from amt_saga_tpu.saga.loop import Transcriber


@pytest.fixture(scope="module")
def cfg_pair():
    host = default_config().override(**{"run.emission_evidence": False})
    dev = default_config().override(**{"run.emission_evidence": True})
    return host, dev


def _fixture_batch(cfg, seconds=6.0):
    waves = []
    for seed, voices in ((11, 2), (12, 4), (13, 4), (14, 6)):
        w, _ = make_clip(cfg, kind="mus", seconds=seconds,
                         n_voices=voices, seed=seed)
        waves.append(w)
    n = max(len(w) for w in waves)
    return np.stack([np.pad(w, (0, n - len(w))) for w in waves])


def test_device_traces_match_host_columns(cfg_pair):
    """tr1 (sum of 3 filterbank columns off the device spectrogram)
    must equal the host _ColCache.region to f32 tolerance."""
    from amt_saga_tpu.saga.evidence import EvidenceRunner, _pack  # noqa: F401
    from amt_saga_tpu.saga.snap import (_ColCache, _regions,
                                        snap_stft_mag)
    from amt_saga_tpu.saga.loop import spectrogram_batch

    cfg = cfg_pair[0]
    rng = np.random.default_rng(7)
    wave = rng.standard_normal(cfg.dsp.sample_rate * 2).astype(np.float32)
    T = cfg.dsp.raw_num_frames(len(wave))
    spec = np.asarray(spectrogram_batch(
        jnp.asarray(wave[None]), cfg))[0, :T, :cfg.dsp.n_bins]
    ev = _ColCache(snap_stft_mag(wave, cfg), cfg)
    for pitch in (40, 60, 80, 99):
        for h, reg in _regions(pitch, cfg):
            host = ev.region(0, T, reg)
            dev = spec[:, reg[0]:reg[1]].sum(axis=1)
            np.testing.assert_allclose(dev, host, rtol=3e-5, atol=1e-3)


def test_device_evidence_midi_equals_host_chain(cfg_pair):
    """End-to-end: forcing the device evidence pass must reproduce the
    pure-host chain's MIDI bytes on mixed 2/4/6-voice fixtures (any
    difference would be an f32 gate-margin tie — none on clean
    content)."""
    cfg_h, cfg_d = cfg_pair
    waves = _fixture_batch(cfg_h)
    seqs_h = Transcriber(cfg_h).transcribe_batch(waves)
    tr_d = Transcriber(cfg_d)
    seqs_d = tr_d.transcribe_batch(waves)
    runner = tr_d.evidence_runner()
    assert runner is not None and runner.stats["lanes"] == len(waves)
    for h, d in zip(seqs_h, seqs_d):
        assert notes_to_midi_bytes(h) == notes_to_midi_bytes(d)


def test_snap_lane_applied_and_matches_host(cfg_pair):
    """A lane where the onset snap fires must apply it through the
    two-round evidence path (exact host decisions on shipped windows,
    round B on the post-snap pool) and emit MIDI identical to the
    pure-host chain (the pinned 4-voice octave-mask clip from
    tests/test_snap.py, where the snap is known to fire through the
    full pipeline)."""
    from amt_saga_tpu.runtime.fixtures import make_corpus

    cfg_h, cfg_d = cfg_pair
    clips = make_corpus(cfg_h, kind="mus", n_clips=3, seconds=10.0,
                        seed=1234, n_voices=4)
    waves = np.asarray(clips[2][0], dtype=np.float32)[None]
    seqs_h = Transcriber(cfg_h).transcribe_batch(waves)
    tr_d = Transcriber(cfg_d)
    seqs_d = tr_d.transcribe_batch(waves)
    runner = tr_d.evidence_runner()
    assert runner.stats["snapped"] >= 1
    assert runner.stats["fallback"] == 0
    assert notes_to_midi_bytes(seqs_h[0]) == notes_to_midi_bytes(seqs_d[0])


def test_dedup_keep_matches_dedup_twins(cfg_pair):
    """_dedup_keep's kept set and order must equal dedup_twins' output
    for twin-bearing sequences."""
    from amt_saga_tpu.core.notes import Note
    from amt_saga_tpu.saga.evidence import _dedup_keep
    from amt_saga_tpu.saga.snap import dedup_twins

    cfg = cfg_pair[0]
    spf = cfg.dsp.hop / cfg.dsp.sample_rate
    notes = [
        Note(1.0, 0.5, 60, 21, 0),
        Note(1.0 + spf, 0.5, 60, 99, 0),      # louder twin 1 frame later
        Note(2.0, 0.25, 64, 80, 0),
        Note(2.0, 0.25, 64, 80, 0),           # exact twin, index tiebreak
        Note(3.0, 0.25, 70, 50, 0),
    ]
    seq = NoteSequence(list(notes))
    keep = _dedup_keep(seq, cfg)
    assert keep is not None
    kept = [seq.notes[i] for i in keep]
    expect = dedup_twins(seq, cfg)
    assert kept == list(expect.notes)
    # no-twin sequence: None (pure-host keeps the original object)
    seq2 = NoteSequence([notes[0], notes[2], notes[4]])
    assert _dedup_keep(seq2, cfg) is None
