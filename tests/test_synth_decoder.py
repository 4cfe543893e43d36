"""SING-style neural synthesizer tests (SURVEY.md Lsynth/C8, PAPERS.md)."""

import numpy as np
import pytest

from amt_saga_tpu.evaluation.f1 import note_f1
from amt_saga_tpu.models.synth_decoder import (
    distill,
    generate_bank,
    neural_template_arrays,
)
from amt_saga_tpu.runtime.fixtures import make_clip
from amt_saga_tpu.saga.loop import Transcriber
from amt_saga_tpu.synth.templates import template_bank


@pytest.fixture(scope="module")
def trained(tiny_config):
    return distill(tiny_config, steps=1500, log_every=500)


def test_decoder_reproduces_template_bank(tiny_config, trained):
    ref = template_bank(tiny_config.synth, tiny_config.dsp)
    gen = generate_bank(tiny_config, trained)
    assert gen.shape == ref.shape
    assert np.all(gen >= 0)
    rel = np.linalg.norm(gen - ref) / np.linalg.norm(ref)
    assert rel < 0.15, rel  # distillation converges to the analytic bank


def test_transcription_with_neural_bank(tiny_config, trained):
    tmpl = neural_template_arrays(tiny_config, trained)
    tr = Transcriber(tiny_config, tmpl=tmpl)
    wave, ref = make_clip(tiny_config, kind="isol", seconds=4.0,
                          n_notes=3, seed=0)
    pred = tr.transcribe(wave)
    r = note_f1(pred, ref)
    assert r.f1 >= 0.8, (r, pred.to_arrays(), ref.to_arrays())


@pytest.fixture(scope="module")
def audio_trained(tiny_config):
    """Decoder trained on rendered-audio targets (VERDICT r1 #4) — the
    production training path, seeded for determinism."""
    from amt_saga_tpu.models.synth_decoder import train_on_audio

    return train_on_audio(tiny_config, steps=3000, variants=4, seed=1,
                          log_every=1000)


def test_audio_trained_generalizes_to_holdout(audio_trained):
    # Held-out (pitch, duration) combos were never seen in training: the
    # decoder must reconstruct them through its embeddings.
    assert audio_trained["holdout_mse"] < 5e-3, audio_trained["holdout_mse"]


def test_audio_trained_synth_roundtrip(tiny_config, audio_trained, tmp_path):
    from amt_saga_tpu.models.synth_decoder import (
        generate_bank,
        load_synth,
        save_synth,
    )

    path = str(tmp_path / "synth.msgpack")
    save_synth(audio_trained, path)
    back = load_synth(tiny_config, path)
    np.testing.assert_array_equal(
        generate_bank(tiny_config, audio_trained),
        generate_bank(tiny_config, back))


def test_neural_bank_beats_analytic_on_mismatch(tiny_config, audio_trained):
    """VERDICT r1 #4 acceptance: the audio-trained neural bank transcribes
    the template-mismatch robustness suite at F1 >= the analytic bank
    (and >= it on clean content too).  Deterministic: seeded training on
    the CPU backend.

    The emission refinement chain (onset snap / twin dedup / re-strike
    split) is held OFF for both: it reads the ANALYTIC harmonic model
    and is skipped under a tmpl override (Transcriber.snaps_onsets),
    so leaving it on would hand the analytic side an emission-stage
    edge unrelated to bank quality — the thing this test measures."""
    from amt_saga_tpu.evaluation.f1 import corpus_f1

    cfg = tiny_config.override(**{"loop.onset_snap_frames": 0,
                                  "loop.restrike_split": False,
                                  "loop.dedup_twins": False})
    tr_a = Transcriber(cfg)
    tr_n = Transcriber(cfg, tmpl=neural_template_arrays(cfg, audio_trained))
    mismatch = cfg.override(**{
        "synth.decay_seconds": 0.45,
        "synth.instrument_rolloffs": [1.4],
        "synth.release_seconds": 0.08,
    })

    def suite(tr, render_cfg):
        pairs = []
        for kind, kw in [("isol", dict(n_notes=4)),
                         ("mus", dict(n_voices=2))]:
            for s in range(3):
                w, ref = make_clip(render_cfg, kind=kind, seconds=6.0,
                                   seed=700 + s, **kw)
                pairs.append((tr.transcribe(w), ref))
        return corpus_f1(pairs).f1

    mis_a, mis_n = suite(tr_a, mismatch), suite(tr_n, mismatch)
    clean_a, clean_n = suite(tr_a, cfg), suite(tr_n, cfg)
    assert mis_n >= mis_a, (mis_n, mis_a)
    assert clean_n >= clean_a, (clean_n, clean_a)


def test_golden_parity_with_neural_bank(tiny_config, audio_trained):
    """Parity is bank-agnostic: golden oracle on the SAME neural bank
    must emit byte-identical MIDI to the TPU path."""
    from amt_saga_tpu.core.midi import notes_to_midi_bytes
    from amt_saga_tpu.golden.pipeline import transcribe_golden
    from amt_saga_tpu.models.synth_decoder import neural_atoms

    cfg = tiny_config
    atoms = neural_atoms(cfg, audio_trained)
    tr = Transcriber(cfg, tmpl=neural_template_arrays(cfg, audio_trained,
                                                      atoms=atoms))
    for kind, kw in [("isol", dict(n_notes=3)), ("mus", dict(n_voices=2))]:
        wave, _ = make_clip(cfg, kind=kind, seconds=4.0, seed=11, **kw)
        pred = tr.transcribe(wave)
        gold = transcribe_golden(wave, cfg, atoms=atoms).sequence
        assert notes_to_midi_bytes(pred) == notes_to_midi_bytes(gold)
